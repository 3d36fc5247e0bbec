package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression producing the DISTINCT word n-gram shingle
  * hashes of a token array as `array<bigint>` — the hot kernel of the
  * near-duplicate pipelines (n-gram Jaccard, MinHash).
  *
  * The composed-builtin formulation
  * `array_distinct(transform(sequence(...), i => xxhash64(concat_ws(" ",
  * slice(toks, i+1, n)))))` evaluates its lambda INTERPRETED: per shingle an
  * array slice allocation, a string build, and a string hash through the
  * expression-tree walker. This kernel is one JVM loop per document: each
  * token is hashed once (XXH64 over its UTF-8 bytes), each shingle hash is
  * an order-sensitive XXH64 chain over n token hashes (8-byte mixes — no
  * string materialization), deduplicated in a per-row hash set.
  *
  * The shingle key is a 64-bit identity for the shingle STRING (two distinct
  * shingles collide with probability ~2⁻⁶⁴), so set measures computed
  * downstream (document frequency, Jaccard, MinHash agreement) match a
  * string-based oracle exactly, modulo that negligible collision mass.
  *
  * Reference capability: dedup generalization of `changes`
  * (striot docs/Operators.md:109-119); SURVEY §7.1 step 9.
  */
case class ShingleHash64(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHash64.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash64.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash64 {

  private val Seed = 42L

  /** One pass per document; called from both interpreted eval and generated
    * code. Null tokens (not produced by our tokenizer, but defensively)
    * hash to the fixed sentinel `XXH64.hashLong(0, seed)` — distinct from
    * the hash of any real token, including the empty string. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      th(i) = if (s == null) XXH64.hashLong(0L, Seed) else XXH64.hashUTF8String(s, Seed)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, (m - n + 1) * 2))
    var k = 0
    i = 0
    while (i <= m - n) {
      var acc = Seed
      var j = 0
      while (j < n) { acc = XXH64.hashLong(th(i + j), acc); j += 1 }
      if (seen.add(acc)) { out(k) = acc; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Column wrapper over a token-array column. */
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHash64(Bridge.expression(tokens), n))
}
