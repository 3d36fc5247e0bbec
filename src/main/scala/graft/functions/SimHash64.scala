package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array: each token's xxhash64 votes
  * ±1 per bit position; fingerprint bit b is set iff the vote sum is
  * positive.
  *
  * The composed-builtin formulation (`aggregate` over 64 bit positions,
  * each re-running an inner `aggregate` over the token-hash array)
  * evaluates INTERPRETED and walks the array 64 times per row. This
  * kernel hashes each token once (identical `xxhash64` semantics: seed
  * 42, UTF-8 bytes; null tokens contribute the bare seed, exactly like
  * the builtin's null pass-through) and accumulates all 64 vote counters
  * in a single pass — same fingerprint, 1/64th the array traffic, inside
  * whole-stage codegen. */
case class SimHash64(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** Spark's `xxhash64` default seed — token hashes must be bit-identical
    * to `xxhash64(tok)` so kernel and builtin formulations agree. */
  private val Seed = 42L

  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      // the builtin xxhash64 passes nulls through, leaving the running
      // hash at the seed — mirror that here
      val h = if (s == null) Seed else XXH64.hashUTF8String(s, Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Column wrapper over a token-array column. */
  def apply(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
}
