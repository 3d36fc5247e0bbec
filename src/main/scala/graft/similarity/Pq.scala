package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Product quantization (PQ) — the compressed-domain ANN tier between the
  * int8 scalar codes (`q_knn_quantized`) and the IVF cell index
  * (`q_knn_ivf_*`): the embedding is split into `m` contiguous subspaces,
  * each subspace gets its own small codebook, and a vector is stored as
  * `m` small code ids (here 4 × 3 bits ≈ 2 bytes vs 256 bytes of floats —
  * the Jégou/Douze/Schmid TPAMI'11 construction). Search runs entirely in
  * the compressed domain via ADC (asymmetric distance computation): per
  * query, a tiny `m × ksub` lookup table of exact query-to-centroid
  * subdistances is precomputed once, and a corpus vector's approximate
  * distance is just `m` table lookups summed — no float vector is touched
  * after encoding.
  *
  * Scale shape: encoding is a map-only pass over the corpus (the
  * codegen'd [[graft.functions.NearestCell]] kernel per subspace —
  * reference `docs/Operators.md:1-40`'s pure per-element map, which is
  * why it composes with any downstream shuffle); the codes table is what
  * a 100 TB deployment persists (16–128× smaller than the vectors, so
  * the scan that dominates ANN cost shrinks by the same factor); the ADC
  * LUT is a per-query constant folded into an expression literal here
  * (a broadcast in multi-query form), so the search is one scan of the
  * codes with k·m doubles of driver state — the exact shape FAISS's
  * IndexPQ runs, re-expressed as a Spark plan.
  *
  * Everything stays oracle-replayable: codebooks are seed-point
  * (embeddings of the `ksub` lowest ids, sliced per subspace — the
  * [[Ivf.seedCentroids]] convention), assignment is squared-L2 argmin
  * with lowest-code tiebreak, and every LUT entry is rounded at 6dp
  * before the fixed-order 4-term sum, so DuckDB re-derives every code,
  * table entry, and rank value-for-value.
  */
object Pq {

  /** Per-subspace seed-point codebooks: the full-width seed vectors of
    * [[Ivf.seedCentroids]] (ids 0..ksub−1) sliced into `m` contiguous
    * `dsub`-wide pieces — codebooks(sub)(code) is a centroid subvector. */
  def seedCodebooks(corpus: DataFrame, idCol: String, embCol: String,
                    m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    val seeds = Ivf.seedCentroids(corpus, idCol, embCol, ksub)
    val d = seeds.head.length
    require(d % m == 0, s"embedding width $d not divisible into $m subspaces")
    val dsub = d / m
    Array.tabulate(m)(sub => seeds.map(_.slice(sub * dsub, sub * dsub + dsub)))
  }

  /** Encode columns `c0..c(m-1)`: per subspace, nearest-codeword id over
    * the sliced embedding (one fused codegen kernel per subspace — the
    * whole encode is a single map-only projection). */
  def encodeCols(emb: Column, codebooks: Array[Array[Array[Double]]]): Seq[Column] = {
    val dsub = codebooks.head.head.length
    codebooks.indices.map(sub =>
      Ivf.cellOf(slice(emb, sub * dsub + 1, dsub), codebooks(sub)).as(s"c$sub"))
  }

  /** ADC top-k: `queries` (a small query set — collected to build the
    * per-query LUTs, the PQ analog of the whitelisted broadcast query
    * set) ranked against the ENCODED corpus only. Approximate distance =
    * sum over subspaces of the query's exact distance to the centroid the
    * corpus vector's code names; each LUT entry is rounded at 6dp and the
    * per-row sum adds the `m` terms in fixed subspace order, so the
    * emitted `adc` doubles are engine-portable. */
  def adcKnn(corpus: DataFrame, queries: DataFrame,
             codebooks: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val qs: Array[(Long, Array[Double])] = queries
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    // lut(q)(sub)(j): exact squared L2 between the query's subvector and
    // codeword j, accumulated left-to-right like NearestCell/list_sum,
    // floor-rounded at 6dp (the roundp formula) for portability
    def subDist(q: Array[Double], sub: Int, w: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      val lim = math.min(dsub, math.max(0, q.length - sub * dsub))
      while (i < lim) {
        val diff = q(sub * dsub + i) - w(i)
        s += diff * diff
        i += 1
      }
      math.floor(s * 1e6 + 0.5) / 1e6
    }
    val lutRows = qs.map { case (qid, q) =>
      struct(
        lit(qid).as("q_id") +:
          codebooks.indices.map(sub =>
            array(codebooks(sub).map(w => lit(subDist(q, sub, w))): _*).as(s"l$sub")): _*)
    }
    val codes = corpus.select(
      col("vec_id").cast("long").as("n_id") +: encodeCols(col("embedding"), codebooks): _*)
    val withQ = codes.select(col("*"), explode(array(lutRows: _*)).as("q"))
    val adc = codebooks.indices
      .map(sub => element_at(col(s"q.l$sub"), col(s"c$sub") + 1))
      .reduceLeft(_ + _)
    val pairs = withQ
      .filter(col("q.q_id") =!= col("n_id"))
      .select(col("q.q_id").as("q_id"), col("n_id"), adc.as("adc"))
    Relational.topKPerGroup(pairs, k, Seq(col("q_id")), Seq(col("adc"), col("n_id")))
      .select("q_id", "n_id", "adc", "rank")
  }
}
