package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA top component by ALL-INTEGER power iteration — the third "training
  * loop under the oracle" (with trained BPE and Lloyd k-means): every step
  * is exact 64-bit arithmetic, so a SQL oracle replays the whole
  * optimization unrolled CTE by CTE and the result hash-matches.
  *
  * Design for scale: the only corpus-sized work is the co-moment aggregate
  * ([[graft.functions.OuterProductAgg]] — O(d²) task state, one scan) and
  * the final scoring scan (integer dot per row). The d×d eigensolve is
  * driver-side ON PURPOSE: its size is independent of corpus size (64×64
  * here), the same shape every production PCA-at-scale takes. Numerical
  * contract: the iterate is renormalized to max|v| = SCALE each step with
  * floor division on magnitudes (sign split keeps floor == truncation on
  * both engines), so "the result of THIS algorithm" is bit-identical
  * everywhere — convergence to the true eigenvector is the usual power-
  * iteration guarantee, with ~3 digits of per-step precision.
  *
  * Overflow audit (all Long): M_ij = n·Σqᵢqⱼ − SᵢSⱼ with |q| ≤ 128 —
  * both terms ≤ n²·2¹⁴, so |M| ≤ 2¹⁵n²; matvec terms ≤ d·SCALE·|M| —
  * at d=64, SCALE=1000, safe for n up to ~5e6 rows of the aggregate's
  * own cap; the scored dot is ≤ d·128·SCALE ≈ 2²³. */
object Pca {

  val Scale = 1000L

  /** Integer centered-scatter matrix n²·cov from the OuterProductAgg
    * layout [d² co-moments][d sums][n]. */
  def scatterMatrix(m: Seq[Long], d: Int): Array[Array[Long]] = {
    require(m.length == d * d + d + 1, s"layout mismatch: ${m.length} for d=$d")
    val n = m(d * d + d)
    Array.tabulate(d, d)((i, j) => n * m(i * d + j) - m(d * d + i) * m(d * d + j))
  }

  /** `iters` rounds of v ← normalize(M·v) from v₀ = (Scale,…,Scale);
    * normalization divides magnitudes by max|u| (floor) and restores the
    * sign, mirroring the oracle's `//` on non-negative operands. */
  def powerIteration(mat: Array[Array[Long]], iters: Int): Array[Long] = {
    val d = mat.length
    var v = Array.fill(d)(Scale)
    var t = 0
    while (t < iters) {
      val u = Array.tabulate(d) { i =>
        var acc = 0L
        var j = 0
        while (j < d) { acc += mat(i)(j) * v(j); j += 1 }
        acc
      }
      val mx = u.map(math.abs).max
      if (mx != 0L) v = u.map(x => if (x < 0) -((-x) * Scale / mx) else x * Scale / mx)
      t += 1
    }
    v
  }

  /** Integer principal score q·v for a materialized int-code column. */
  def score(q: Column, v: Seq[Long]): Column = {
    val vLit = array(v.map(lit): _*)
    aggregate(zip_with(q, vLit, (a, b) => a.cast("bigint") * b),
      lit(0L), (acc, x) => acc + x)
  }

  /** Full pipeline: distributed co-moment aggregate → driver power
    * iteration (constant-size collect: d²+d+1 longs) → distributed
    * integer scoring scan. */
  def principalScores(codes: DataFrame, q: Column, d: Int, iters: Int): DataFrame = {
    val op = udaf(new graft.functions.OuterProductAgg(d),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())
    val m = codes.agg(op(q).as("m")).collect().head.getSeq[Long](0)
    val v = powerIteration(scatterMatrix(m, d), iters)
    codes.withColumn("score", score(q, v.toSeq))
  }
}
