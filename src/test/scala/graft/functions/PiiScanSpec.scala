package graft.functions

import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

/** Pins [[PiiScan]]'s hand-rolled scanners to the `java.util.regex`
  * semantics of the composed formulation they replace: email/phone
  * counts via `Matcher.find()` loops and the email→phone
  * `replaceAll` chain with `$1` splicing — the EXACT computation Spark's
  * `regexp_count`/`regexp_replace` performed in the pre-kernel
  * q_redact_pii. Directed cases cover every documented edge (dates,
  * leading-digit leakage, adjacent phones sharing a boundary char,
  * multi-@ emails, trailing dots, unicode, surrogate pairs, empties),
  * and a 4000-case seeded fuzz over a PII-dense alphabet guards the
  * backtracking corners no directed list anticipates.
  */
class PiiScanSpec extends AnyFunSuite {

  private val email = Pattern.compile(TextAnalysis.EmailPattern)
  private val phone = Pattern.compile(TextAnalysis.PhoneBoundedPattern)

  private def refCount(p: Pattern, s: String): Int = {
    val m = p.matcher(s); var c = 0
    while (m.find()) c += 1
    c
  }

  private def refRedact(s: String): String =
    phone.matcher(email.matcher(s).replaceAll("[EMAIL]"))
      .replaceAll("$1[PHONE]")

  private def check(s: String): Unit = {
    val row = PiiScan.compute(UTF8String.fromString(s))
    val (got, ne, np) = (row.getUTF8String(0).toString, row.getInt(1), row.getInt(2))
    assert(got == refRedact(s), s"redacted mismatch on <$s>")
    assert(ne == refCount(email, s), s"n_emails mismatch on <$s>")
    assert(np == refCount(phone, s), s"n_phones mismatch on <$s>")
  }

  test("directed edges agree with java.util.regex") {
    Seq(
      "",
      "no pii here at all",
      "a@b.co",
      "a@b.c", // 1-letter TLD: no match
      "x@y.com.", // trailing dot outside the match
      "x@y.com.pl extra", // latest valid dot wins
      "a@b@example.com", // first local fails, later start matches
      "a@b.c@example.com",
      "ab@cd@ef.gh@ij.kl", // cascade of @ signs
      "user.name+tag%ok@sub.domain-x.org",
      "@@@missing@locals@.com",
      "x@-.-.ab", // hyphens-only domain with valid tail
      "x@....ab", // dots-only first part
      "+1-555-0042", // international short form
      "555-123-4567", // NANP
      "+44-20-7946-0958", // 4-group international
      "5551234567", // no separators: no match
      "2023-01-15", // date: must not leak digits mid-number
      "dates 2023-01-15 and 1999-12-31 stay", // 4-digit lead: no match
      "call 12-34-56 or 78-90-12", // adjacent phones, shared boundaries
      "5+1-22-33", // '+' preceded by digit: core starts past it
      "x+1-22-33", // non-digit then plus
      "+1-22-33", // plus at string start (^ branch)
      "1-22-33", // digit at string start (^ branch)
      "-1-22-33", // separator at start consumed as boundary
      " 1-23-45-67-89", // {2,3} prefers 3 reps, 4th group left over
      "1-23-45-67 89-12-34", // two matches
      "123-4567-89-0", // 2-digit tail after 4-digit groups
      "12-345 678-90", // space separators
      "a 12-34-5678901 b", // rep digit run >4: backtracks to 4
      "email a@b.com phone 1-23-45 mixed a@b.com 1-23-45",
      "contact user42@example.com or +1-555-0042 call 555-867-0042",
      "übermail@exämple.com", // non-ASCII splits local/domain runs
      "日本語12-34-56テスト", // unicode around a phone
      "😀 55-66-77 😀", // surrogate pairs
      "1-22-33-44-55-66", // long chain: one match of 3 reps + leftovers
      "++1-22-33", // double plus: first is boundary
      "12345678901234567890"
    ).foreach(check)
  }

  test("4000-case seeded fuzz over a PII-dense alphabet agrees") {
    val rnd = new scala.util.Random(0x9115)
    // alphabet biased so emails/phones/near-misses occur constantly
    val alphabet = "0123456789+- .@abz._%ABZ,é"
    for (_ <- 1 to 4000) {
      val len = rnd.nextInt(60)
      val s = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      check(s)
    }
  }

  test("fuzz with structured fragments (emails/phones embedded in noise)") {
    val rnd = new scala.util.Random(0x7a21)
    val frags = Seq("a@b.co", "x@y.z", "+1-555-0042", "12-34-56", "2023-01-15",
      "555", "-", " ", "@", ".", "com", "a", "1", "%+", "..", "9999")
    for (_ <- 1 to 1000) {
      val s = (1 to rnd.nextInt(8)).map(_ => frags(rnd.nextInt(frags.length))).mkString
      check(s)
    }
  }
}
