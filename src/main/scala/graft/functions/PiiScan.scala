package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the whole PII-redaction surface of
  * `TextAnalysis`: one struct `(redacted, n_emails, n_phones)` per
  * document, computed by hand-rolled scanners that replicate
  * `java.util.regex` semantics for [[graft.text.TextAnalysis.EmailPattern]]
  * and [[graft.text.TextAnalysis.PhoneBoundedPattern]] EXACTLY —
  * leftmost-first attempt order, greedy quantifiers with backtracking,
  * non-overlapping `find()` resumption, `$1[PHONE]` group splicing.
  *
  * Why: the composed form evaluates four-to-six full regex passes per
  * document (two `regexp_count`s + the email→phone `regexp_replace`
  * chain, duplicated under `md5` and `length` until subexpression
  * elimination catches it), and generic backtracking-regex scanning was
  * the hottest remaining per-document loop on the surface after the r14
  * kernel wave (q_redact_pii 15.2× at 26× data). This kernel makes three
  * allocation-light linear passes (email count+replace over the
  * original, phone count over the original, phone replace over the
  * email-redacted text) with character-class tests instead of a regex
  * engine, inside whole-stage codegen.
  *
  * Semantics contract (pinned by `PiiScanSpec`'s fuzz agreement against
  * `java.util.regex` itself — the engine the composed form uses):
  *
  *  - Email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: at each
  *    attempt position, the local run is maximal; a failed attempt
  *    skips to the end of the local run (every start inside it fails
  *    identically — same run, same `@`); the domain backtracks the
  *    greedy first part from the right, i.e. the LATEST dot followed by
  *    ≥2 letters wins, and the trailing letter run is maximal.
  *  - Phone `(^|[^0-9])(\+?\d{1,3}([- ]\d{2,4}){2,3})`: attempts try the
  *    `^` alternative first (start of input only), then a consumed
  *    non-digit; the digit groups try longest-first; the `{2,3}`
  *    repetition prefers extending (3 over 2); nothing follows the
  *    pattern, so acceptance happens exactly when extension fails.
  *    Replacement splices the captured boundary char back (`$1`).
  *
  * Null input propagates null (UnaryExpression default); all three
  * fields are non-null for non-null input.
  */
case class PiiScan(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = PiiScan.schema
  override def prettyName: String = "pii_scan"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PiiScan.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PiiScan.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiScan {

  val schema: StructType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false)))

  def apply(text: Column): Column = Bridge.column(PiiScan(Bridge.expression(text)))

  // character classes of the two patterns (ASCII only — non-ASCII chars
  // can never participate in a match, exactly as under java.util.regex)
  @inline private def isLocal(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  @inline private def isDomain(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '-'
  @inline private def isLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isSep(c: Char): Boolean = c == '-' || c == ' '

  /** Next email match at or after `from`: packs (start, end) as a Long,
    * or -1 if none. find()-equivalent: earliest successful attempt. */
  private def findEmail(s: String, from: Int): Long = {
    val n = s.length
    var i = from
    while (i < n) {
      if (!isLocal(s.charAt(i))) i += 1
      else {
        var j = i
        while (j < n && isLocal(s.charAt(j))) j += 1 // maximal local run
        if (j >= n || s.charAt(j) != '@') i = j + 1 // every start in [i,j) fails
        else {
          var k = j + 1
          while (k < n && isDomain(s.charAt(k))) k += 1 // maximal domain run
          // greedy first part backtracks from the right: latest dot with
          // >=2 following letters wins; the letter run is then maximal
          var p = k - 1
          var end = -1
          while (p >= j + 2 && end < 0) {
            if (s.charAt(p) == '.') {
              var le = p + 1
              while (le < n && isLetter(s.charAt(le))) le += 1
              if (le - (p + 1) >= 2) end = le
            }
            if (end < 0) p -= 1
          }
          if (end >= 0) return (i.toLong << 32) | end.toLong
          // whole '@'+domain failed for every start in the local run;
          // resume AFTER the '@' (domain chars can begin a later match)
          i = j + 1
        }
      }
    }
    -1L
  }

  /** Phone-core match `\+?\d{1,3}([- ]\d{2,4}){2,3}` starting exactly at
    * `q`; returns end index or -1. Longest-first digit groups, extension-
    * preferred repetition — nothing follows the pattern, so the first
    * maximal-preference parse that reaches >=2 reps is the regex's. */
  private def phoneCore(s: String, q: Int): Int = {
    val n = s.length
    var d = q
    if (d < n && s.charAt(d) == '+') d += 1 // \+? (without-plus branch can
    // never succeed when a '+' is present: \d{1,3} would face the '+')
    var run = 0
    while (d + run < n && run < 3 && isDigit(s.charAt(d + run))) run += 1
    if (run == 0) return -1
    var c1 = run
    while (c1 >= 1) {
      // digit count must be EXACT: if a 4th digit follows a 3-digit take,
      // java's \d{1,3} still matches 3 and leaves the digit for the next
      // element — which needs [- ] and fails — so trying shorter takes
      // that still face a digit is wasted but harmless; mirror the order.
      val r = phoneReps(s, d + c1, 0)
      if (r >= 0) return r
      c1 -= 1
    }
    -1
  }

  /** `([- ]\d{2,4}){done..3}` from `pos`; prefer extending, accept at
    * >=2 reps when extension fails. */
  private def phoneReps(s: String, pos: Int, done: Int): Int = {
    val n = s.length
    if (done < 3 && pos < n && isSep(s.charAt(pos))) {
      var run = 0
      while (pos + 1 + run < n && run < 4 && isDigit(s.charAt(pos + 1 + run))) run += 1
      var c = run
      while (c >= 2) {
        val r = phoneReps(s, pos + 1 + c, done + 1)
        if (r >= 0) return r
        c -= 1
      }
    }
    if (done >= 2) pos else -1
  }

  /** Next bounded-phone match at or after `from`: packs
    * (matchStart, coreStart(low 16 sep from end), end). Returns null-like
    * -1 if none. matchStart == coreStart when the `^` alternative
    * matched (group 1 empty). */
  private def findPhone(s: String, from: Int): (Int, Int, Int) = {
    val n = s.length
    var i = from
    while (i <= n) {
      if (i == 0) {
        // attempt at 0: '^' branch first (group1 empty) ...
        val r0 = if (n > 0) phoneCore(s, 0) else -1
        if (r0 >= 0) return (0, 0, r0)
        // ... then the consumed-non-digit branch within the same attempt
        if (n > 0 && !isDigit(s.charAt(0))) {
          val r1 = phoneCore(s, 1)
          if (r1 >= 0) return (0, 1, r1)
        }
      } else if (i < n && !isDigit(s.charAt(i))) {
        val r = phoneCore(s, i + 1)
        if (r >= 0) return (i, i + 1, r)
      }
      i += 1
    }
    null
  }

  /** The fused scan. Three linear passes; one String materialization of
    * the input, one StringBuilder per replacement pass. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    // pass 1: emails — count on the original AND build the email-redacted
    // text in the same scan (identical match set by construction)
    var nEmails = 0
    val sb = new java.lang.StringBuilder(s.length + 16)
    var pos = 0
    var m = findEmail(s, pos)
    while (m >= 0) {
      val st = (m >>> 32).toInt
      val en = (m & 0xffffffffL).toInt
      sb.append(s, pos, st).append("[EMAIL]")
      nEmails += 1
      pos = en
      m = if (pos <= s.length) findEmail(s, pos) else -1L
    }
    sb.append(s, pos, s.length)
    val emailRedacted = sb.toString
    // pass 2: phone COUNT on the ORIGINAL text (the query's
    // regexp_count(injected, PhoneBoundedPattern) contract)
    var nPhones = 0
    pos = 0
    var pm = findPhone(s, pos)
    while (pm != null) {
      nPhones += 1
      pos = pm._3
      pm = if (pos <= s.length) findPhone(s, pos) else null
    }
    // pass 3: phone REPLACE on the email-redacted text ($1 splice)
    val sb2 = new java.lang.StringBuilder(emailRedacted.length + 16)
    pos = 0
    pm = findPhone(emailRedacted, pos)
    while (pm != null) {
      val (st, core, en) = pm
      sb2.append(emailRedacted, pos, st)
      if (core > st) sb2.append(emailRedacted.charAt(st)) // $1 boundary char
      sb2.append("[PHONE]")
      pos = en
      pm = if (pos <= emailRedacted.length) findPhone(emailRedacted, pos) else null
    }
    sb2.append(emailRedacted, pos, emailRedacted.length)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb2.toString),
      Integer.valueOf(nEmails), Integer.valueOf(nPhones)))
  }
}
