package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native kernel for multi-table SRP (random-hyperplane) LSH bucketing:
  * one bucket id per hash table from sign-bit projections of the embedding
  * against deterministic ±1 hyperplanes.
  *
  * The composed-builtin formulation evaluates `tables × planesPerTable`
  * interpreted `zip_with`+`aggregate` lambdas per row (each a full array
  * pass through the expression walker). This kernel is a single JVM loop:
  * the ±1 weight matrix is materialized once per operator instance, and
  * each row costs `tables·planes·dims` fused multiply-adds.
  *
  * Plane signs come from THE shared splitmix mix ([[SrpBuckets.planeSign]],
  * which [[graft.similarity.Similarity]] delegates to) — for null-free
  * embeddings of EXACTLY `dims` elements, bucket ids are identical to the
  * composed formulation, which the spec asserts on real data. Degenerate
  * inputs deliberately diverge in the kernel's favor: it SKIPS null
  * elements and projects over the common prefix of a length-mismatched
  * embedding (shorter OR longer than dims), whereas the `zip_with`+
  * `aggregate` formulation null-propagates — a null element, a short
  * array's missing tail, or a long array's null-padded weights each force
  * whole plane bits to 0, silently degrading the hash table. A bucketing
  * function should degrade per-element, not per-plane, so the kernel's
  * semantics are kept and the identity claim is scoped to well-formed
  * inputs.
  */
case class SrpBuckets(child: Expression, dims: Int, planesPerTable: Int, tables: Int)
    extends UnaryExpression with Serializable {

  require(dims >= 1 && planesPerTable >= 1 && planesPerTable <= 63 && tables >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  // one ±1 weight row per plane, built once per operator instance
  @transient private lazy val signs: Array[Array[Double]] =
    SrpBuckets.signMatrix(dims, planesPerTable * tables)

  override def nullSafeEval(input: Any): Any =
    SrpBuckets.compute(input.asInstanceOf[ArrayData], signs, planesPerTable, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("srpSigns", signs, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpBuckets.compute($c, $signsRef, $planesPerTable, $tables);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBuckets {

  /** THE deterministic splitmix plane sign — single source of truth; the
    * HOF formulation in [[graft.similarity.Similarity]] delegates here, so
    * the kernel-vs-HOF bucket identity cannot drift through divergent
    * copies of the mixing constants. */
  private[graft] def planeSign(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) -1.0 else 1.0
  }

  def signMatrix(dims: Int, planes: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => planeSign(p, d))

  /** Called from interpreted eval and generated code: one fused loop over
    * the embedding per plane; sign bits packed per table. Embeddings
    * shorter than `dims` use their actual length (same as the zip_with
    * formulation's common prefix). */
  def compute(emb: ArrayData, signs: Array[Array[Double]],
              planesPerTable: Int, tables: Int): ArrayData = {
    val n = emb.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val w = signs(t * planesPerTable + p)
        val m = math.min(n, w.length)
        var proj = 0.0
        var d = 0
        while (d < m) {
          if (!emb.isNullAt(d)) proj += emb.getFloat(d).toDouble * w(d)
          d += 1
        }
        if (proj > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def apply(emb: Column, dims: Int, planesPerTable: Int, tables: Int): Column =
    Bridge.column(SrpBuckets(Bridge.expression(emb), dims, planesPerTable, tables))
}
