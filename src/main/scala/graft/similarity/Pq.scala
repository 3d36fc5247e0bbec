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

  /** One struct literal per query: `(q_id, l0..l(m-1))` where `l(sub)(j)`
    * is the exact squared L2 between the query's subvector and codeword
    * `j`, accumulated left-to-right like NearestCell/list_sum and
    * floor-rounded at 6dp (the roundp formula) for portability. */
  private def lutRows(queries: DataFrame,
                      codebooks: Array[Array[Array[Double]]]): Array[Column] = {
    val dsub = codebooks.head.head.length
    val qs: Array[(Long, Array[Double])] = queries
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
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
    qs.map { case (qid, q) =>
      struct(
        lit(qid).as("q_id") +:
          codebooks.indices.map(sub =>
            array(codebooks(sub).map(w => lit(subDist(q, sub, w))): _*).as(s"l$sub")): _*)
    }
  }

  /** `m` table lookups summed in fixed subspace order — the ADC distance.
    * `lutCol(sub)`/`codeCol(sub)` name the LUT array and code columns. */
  private def adcExpr(codebooks: Array[Array[Array[Double]]],
                      lutCol: Int => Column, codeCol: Int => Column): Column =
    codebooks.indices
      .map(sub => element_at(lutCol(sub), codeCol(sub) + 1))
      .reduceLeft(_ + _)

  /** ADC top-k: `queries` (a small query set — collected to build the
    * per-query LUTs, the PQ analog of the whitelisted broadcast query
    * set) ranked against the ENCODED corpus only. Approximate distance =
    * sum over subspaces of the query's exact distance to the centroid the
    * corpus vector's code names; each LUT entry is rounded at 6dp and the
    * per-row sum adds the `m` terms in fixed subspace order, so the
    * emitted `adc` doubles are engine-portable. */
  def adcKnn(corpus: DataFrame, queries: DataFrame,
             codebooks: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val codes = corpus.select(
      col("vec_id").cast("long").as("n_id") +: encodeCols(col("embedding"), codebooks): _*)
    val withQ = codes.select(col("*"),
      explode(array(lutRows(queries, codebooks): _*)).as("q"))
    val adc = adcExpr(codebooks, sub => col(s"q.l$sub"), sub => col(s"c$sub"))
    val pairs = withQ
      .filter(col("q.q_id") =!= col("n_id"))
      .select(col("q.q_id").as("q_id"), col("n_id"), adc.as("adc"))
    Relational.topKPerGroup(pairs, k, Seq(col("q_id")), Seq(col("adc"), col("n_id")))
      .select("q_id", "n_id", "adc", "rank")
  }

  /** IVF-PQ: the coarse cell index prunes the scan (each query probes its
    * `nprobe` nearest cells) and PQ ADC ranks WITHIN the probed cells —
    * the FAISS IndexIVFPQ composition, and the shape a 100 TB deployment
    * actually runs: the corpus is persisted bucketed by `cell` carrying
    * only its `m` PQ codes, so a query touches nprobe/nlist of the data
    * AND reads codes instead of vectors (both pruning levers compound).
    * This is the non-residual variant — codes quantize the raw vectors,
    * not the cell residuals — trading a little precision to keep every
    * stage (cells, codes, LUT, ranks) oracle-replayable; the residual
    * refinement is a codebook-training concern, not a plan-shape one. */
  def ivfpqKnn(corpus: DataFrame, queries: DataFrame,
               centroids: Array[Array[Double]],
               codebooks: Array[Array[Array[Double]]],
               k: Int, nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    val cb = corpus.select(
      col("vec_id").cast("long").as("n_id") +:
        Ivf.cellOf(col("embedding"), centroids).as("cell") +:
        encodeCols(col("embedding"), codebooks): _*)
    val qb = queries.select(col("vec_id").cast("long").as("q_id"),
      explode(Ivf.cellsOf(col("embedding"), centroids, nprobe)).as("cell"))
    val lutDf = spark.range(1)
      .select(explode(array(lutRows(queries, codebooks): _*)).as("q"))
      .select(col("q.*"))
    val adc = adcExpr(codebooks, sub => col(s"l$sub"), sub => col(s"c$sub"))
    // probe×LUT is queries×nprobe rows — broadcast against the bucketed
    // codes; a neighbor lives in exactly ONE cell, so probing several
    // cells cannot duplicate a (q_id, n_id) pair
    val pairs = broadcast(qb.join(lutDf, "q_id")).join(cb, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), adc.as("adc"))
    Relational.topKPerGroup(pairs, k, Seq(col("q_id")), Seq(col("adc"), col("n_id")))
      .select("q_id", "n_id", "adc", "rank")
  }
}
