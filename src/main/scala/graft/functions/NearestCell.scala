package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native kernel for nearest-centroid assignment (the IVF coarse quantizer
  * and the Lloyd-step inner loop): squared-L2 argmin over a centroid
  * codebook, lowest cell winning ties.
  *
  * The composed-builtin formulation (`array_position`/`array_min` over k
  * `aggregate(zip_with(...))` distances) walks 2k interpreted lambda
  * evaluations per row — and because higher-order functions never enter
  * whole-stage codegen, the optimizer is also free to collapse the
  * projection above a `Generate`, re-evaluating all of it once per
  * EXPLODED element (k·d× amplification observed in the Lloyd step's
  * per-dimension mean). This kernel is one fused JVM loop — `k·d`
  * multiply-adds per row — and participates in codegen, so projection
  * placement stops mattering.
  *
  * Distances accumulate left-to-right in the same order as the
  * `aggregate` fold (float element cast to double, subtract, square,
  * add), so for null-free embeddings of at least codebook width the
  * chosen cell is identical to the composed formulation — asserted
  * against it on real testdata by `NearestCellSpec`. Degenerate inputs
  * follow the [[SrpBuckets]] convention: null elements are skipped and a
  * length mismatch projects over the common prefix, degrading
  * per-element instead of null-propagating whole distances.
  */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with Serializable {

  require(centroids.nonEmpty, "nearest_cell needs a non-empty codebook")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NearestCell.compute(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCell.compute($c, $csRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCell {

  /** Called from interpreted eval and generated code. Strict `<` keeps the
    * first (lowest) cell on exact ties — `array_position` semantics. */
  def compute(emb: ArrayData, cs: Array[Array[Double]]): Int = {
    val n = emb.numElements()
    var best = 0
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < cs.length) {
      val w = cs(c)
      val m = math.min(n, w.length)
      var s = 0.0
      var d = 0
      while (d < m) {
        if (!emb.isNullAt(d)) {
          val diff = emb.getFloat(d).toDouble - w(d)
          s += diff * diff
        }
        d += 1
      }
      if (s < bestDist) { bestDist = s; best = c }
      c += 1
    }
    best
  }

  /** Column wrapper. */
  def apply(emb: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(NearestCell(Bridge.expression(emb), centroids))
}
