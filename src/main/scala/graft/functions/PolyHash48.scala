package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing [[PortableHash]]'s polynomial
  * string hash — `Σ codepoint(sᵢ)·31^i mod (2³¹−1)` over the first
  * [[PortableHash.MaxChars]] code points; empty string → 0 — as one JVM
  * loop per value.
  *
  * The composed-builtin formulation (`aggregate(sequence(1, len), 0L,
  * (acc, i) => acc + ascii(substr(s, i, 1)) * 31^i)`) evaluates its
  * lambda INTERPRETED: per character a substring allocation, an `ascii`
  * call, and an `element_at` power lookup through the expression-tree
  * walker — and polyHash sits in the INNER loop of every portable-hash
  * pipeline (DSIR features explode one hash per token occurrence,
  * winnowing hashes every k-gram, the rolling fingerprint hashes 64
  * tokens per document). Measured at sf0.1 under honest noop forcing,
  * the interpreted form put q_rolling_portable at 28.4 s — the slowest
  * query on the whole surface by 4×. This kernel is the same arithmetic
  * (bit-for-bit: the agreement spec pins kernel == HOF == Scala twin on
  * unicode, surrogate pairs, >MaxChars, and empty inputs; the SQL
  * oracles that replay ord·31^i sums are untouched) as one codegen'd
  * call.
  *
  * Null propagates (the HOF form also yields NULL on NULL input).
  */
case class PolyHash48(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash48"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHash48.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash48.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash48 {

  private val powers: Array[Long] = PortableHash.powers.toArray

  /** Shared with the other portable-family kernels
    * ([[PortableGramHash64]]). */
  private[functions] def powersForKernels(i: Int): Long = powers(i)

  /** One pass per string; called from both interpreted eval and generated
    * code. Iterates Unicode CODE POINTS (surrogate pairs are one step),
    * matching both `ascii(substr(s, i, 1))` — Spark's substring indexes
    * by code point and `ascii` returns the full code point — and
    * [[PortableHash.polyHashScala]]'s `codePoints()` walk. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return 0L
    var acc = 0L
    var i = 0
    var n = 0
    val max = PortableHash.MaxChars
    while (i < str.length && n < max) {
      val cp = str.codePointAt(i)
      acc += cp.toLong * powers(n)
      i += Character.charCount(cp)
      n += 1
    }
    acc % PortableHash.P
  }
}
