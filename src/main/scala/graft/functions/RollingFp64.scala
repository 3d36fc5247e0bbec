package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the order-sensitive rolling prefix
  * fingerprint: over the first `maxTokens` tokens of a token array,
  * `Σ polyHash(t_i) · 257^(k−i) mod (10⁹+7)` with k = the number of
  * hashed tokens — the closed-form Rabin–Karp fold of
  * `TextAnalysis.rollingPrefixFingerprint`.
  *
  * The composed-builtin formulation (an `aggregate` over
  * `sequence(1, k)` whose lambda evaluates polyHash + two `element_at`
  * power lookups per step) runs INTERPRETED per token per document —
  * even with polyHash itself as a codegen'd kernel ([[PolyHash48]]) the
  * 64-step interpreted fold left q_rolling_portable at 8.9 s at sf0.1,
  * still the slowest non-streaming query on the surface. This kernel is
  * one JVM loop: hash each token once, multiply by the precomputed
  * power, one mod per step. Same arithmetic bit-for-bit (agreement spec
  * pins kernel == HOF fold on empties, shorts, unicode, and >maxTokens
  * inputs); the SQL oracle replaying the closed form is untouched.
  *
  * Empty token arrays fingerprint to 0; null arrays propagate null —
  * both matching the fold.
  */
case class RollingFp64(child: Expression, maxTokens: Int)
    extends UnaryExpression with Serializable {

  require(maxTokens >= 1 && maxTokens <= 64,
    s"maxTokens must be in [1, 64] (got $maxTokens): the term sum is " +
      "overflow-audited for 64 terms")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingFp64.compute(input.asInstanceOf[ArrayData], maxTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingFp64.compute($c, $maxTokens);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFp64 {

  val M = 1000000007L

  /** 257^i mod M for i < 64. */
  private val pow257: Array[Long] =
    Iterator.iterate(1L)(p => p * 257 % M).take(64).toArray

  /** One pass per document. Overflow audit: polyHash < 2³¹,
    * 257-power mod M < 2³⁰, product < 2⁶¹; acc stays < M after each
    * step's mod, so acc + product < 2⁶²  — ANSI-safe. A null token
    * (not produced by our tokenizer) hashes like the HOF fold's
    * null-skipping `when`: contributes 0. */
  def compute(toks: ArrayData, maxTokens: Int): Long = {
    val k = math.min(toks.numElements(), maxTokens)
    var acc = 0L
    var i = 0
    while (i < k) {
      val s = toks.getUTF8String(i)
      if (s != null) {
        // term i (1-based) carries 257^(k-i): position k-1-i zero-based
        acc = (acc + PolyHash48.compute(s) * pow257(k - 1 - i) % M) % M
      }
      i += 1
    }
    acc
  }

  /** Column wrapper over a token-array column. */
  def apply(tokens: Column, maxTokens: Int): Column =
    Bridge.column(RollingFp64(Bridge.expression(tokens), maxTokens))
}
