package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Integer-exact second-moment accumulator over quantized vectors — the
  * distributed input to covariance/PCA: one pass over int8 codes
  * accumulates Σ qᵢqⱼ (the d×d co-moment matrix), Σ qᵢ (per-dim sums) and
  * n in a single flat Long buffer, merged ELEMENTWISE. All arithmetic is
  * integer, so the result is independent of partitioning and merge order
  * — the property that makes the downstream covariance oracle-exact,
  * where a float accumulation would drift per plan.
  *
  * This is the 100 TB shape for Gram/covariance statistics: O(d²) state
  * per task (d=64 → 4 KiB of longs) combined map-side, versus the explode
  * formulation's d²·N shuffle rows. Overflow audit (Spark ANSI throws):
  * |q| ≤ 127+1 after round-half-up, so each product ≤ 2¹⁴; 2⁶³/2¹⁴ ≈ 5.6e14
  * rows per counter — far past any corpus.
  *
  * Buffer/result layout: [d² co-moments row-major][d sums][count]. */
class OuterProductAgg(dim: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[Long]]
    with Serializable {
  require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096] (got $dim)")

  private val size = dim * dim + dim + 1

  override def zero: Array[Long] = new Array[Long](size)

  override def reduce(b: Array[Long], v: Seq[Int]): Array[Long] = {
    require(v.length == dim, s"vector of dim ${v.length}, aggregator expects $dim")
    val a = v.toArray
    var i = 0
    while (i < dim) {
      val vi = a(i).toLong
      var j = 0
      val row = i * dim
      while (j < dim) { b(row + j) += vi * a(j); j += 1 }
      b(dim * dim + i) += vi
      i += 1
    }
    b(size - 1) += 1L
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < size) { b1(k) += b2(k); k += 1 }
    b1
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
