package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** IVF (inverted-file) approximate nearest neighbor: a coarse quantizer
  * (k-means codebook) partitions the corpus into `nlist` cells; a query
  * probes only its own cell(s) instead of scanning the corpus. The
  * standard scale path for embedding search — the corpus is bucketed ONCE
  * (a write-time partitioning at 100 TB: one shuffle on `cell`), and each
  * query's candidate set shrinks by ~nlist×/nprobe.
  *
  * Training uses Spark ML k-means with a fixed seed (deterministic on
  * deterministic data); cell assignment is a pure `Column` expression
  * (distances against centroid literals), so corpus bucketing is a
  * map-only pass — no UDF, no per-row driver work.
  */
object Ivf {

  /** Train the coarse codebook; returns `nlist` centroids. */
  def trainCentroids(corpus: DataFrame, embCol: String, nlist: Int, seed: Long = 42): Array[Array[Double]] = {
    val feat = corpus.select(
      array_to_vector(col(embCol).cast("array<float>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(feat)
    model.clusterCenters.map(_.toArray)
  }

  /** One Lloyd step, engine-portable: assign every vector to its nearest
    * centroid (exact argmin over centroid literals, lowest-cell tiebreak),
    * then recompute each cell's mean PER DIMENSION and round it to 6dp.
    * The rounding is what makes the step replayable by another engine:
    * the only cross-partition float reduction (the mean) is pinned at a
    * fixed precision, so the next iteration's inputs are bit-identical
    * everywhere (the q_embedding_centroids move applied to training).
    * Empty cells keep their previous centroid — the standard Lloyd rule,
    * stated so the oracle can apply the same one.
    *
    * Scale shape: one map pass for assignment fused with posexplode, one
    * hash aggregate on (cell, dim) — partial means combine map-side, so
    * the shuffle carries k×d cells, not vectors — and a k×d-row collect
    * (the codebook, a few KB). Cost per step is one scan + one tiny
    * shuffle regardless of corpus size. */
  def lloydStep(corpus: DataFrame, embCol: String,
                centroids: Array[Array[Double]]): Array[Array[Double]] = {
    // degenerate inputs follow cellOf/NearestCell's tolerance instead of
    // crashing after a full corpus scan: null vectors don't vote (their
    // cell is null), dimensions past the codebook width are ignored (the
    // kernel scores only the common prefix), and a (cell, dim) with no
    // votes — empty cell OR every member shorter than `dim` — keeps the
    // previous centroid's coordinate, the per-dimension form of the
    // standard empty-cell keep rule
    val means = lloydMeans(corpus, embCol, centroids).collect()
    val byCell = means.groupBy(_.getInt(0))
    centroidsFromMeans(centroids, byCell)
  }

  /** The per-(cell, dim) rounded means of one Lloyd step, as a plan.
    *
    * The cell assignment sits in its OWN select BELOW the explode:
    * combining `select(cellOf(...), posexplode(...))` plants the
    * Generate UNDER the projection (the analyzer's ExtractGenerator
    * shape), so the k·d-multiply [[graft.functions.NearestCell]] kernel
    * ran once per EXPLODED row — d× the work, and the real cause of the
    * "Lloyd scheduling floor" (measured 5.0 s vs 0.55 s per step at the
    * 26× scale step; q_kmeans 11 s → ~2 s). Split, the alias survives
    * as a plain attribute above the Generate and the kernel runs once
    * per vector — `LloydPlanShapeSpec` pins the kernel below the
    * Generate so a refactor can't silently reintroduce the d×. */
  private[graft] def lloydMeans(corpus: DataFrame, embCol: String,
                                centroids: Array[Array[Double]]): DataFrame = {
    val dims = centroids.head.length
    corpus
      .filter(col(embCol).isNotNull)
      .select(cellOf(col(embCol), centroids).as("cell"), col(embCol))
      .select(col("cell"), posexplode(col(embCol)).as(Seq("dim", "x")))
      .filter(col("dim") < dims && col("x").isNotNull)
      .groupBy(col("cell"), col("dim"))
      .agg(Relational.roundp(avg(col("x").cast("double")), 6).as("m"))
  }

  private def centroidsFromMeans(centroids: Array[Array[Double]],
      byCell: Map[Int, Array[org.apache.spark.sql.Row]]): Array[Array[Double]] = {
    centroids.indices.map { c =>
      byCell.get(c) match {
        case Some(rows) =>
          val arr = centroids(c).clone()
          rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          arr
        case None => centroids(c)
      }
    }.toArray
  }

  /** Deterministic distributed k-means: seed-point init (the embeddings of
    * the k lowest ids — the classic random-point init made reproducible),
    * then `iters` Lloyd steps. Unlike [[trainCentroids]] (Spark ML, seeded
    * but not SQL-expressible) every step of this trainer is replayable by
    * the DuckDB oracle as chained CTEs — training itself is under the
    * correctness gate, not just the probe path. */
  def lloydTrain(corpus: DataFrame, idCol: String, embCol: String,
                 k: Int, iters: Int): Array[Array[Double]] = {
    require(iters >= 0, s"iters must be >= 0 (got $iters)")
    var cs = seedCentroids(corpus, idCol, embCol, k)
    for (_ <- 0 until iters) cs = lloydStep(corpus, embCol, cs)
    cs
  }

  /** Cell count scaled to the corpus: ceil(n / targetCellSize), floored at
    * `minK`. A FIXED nlist makes every within-cell operation quadratic in
    * corpus size (cells grow as n/k, so per-cell pair work grows as
    * (n/k)² — measured 13.7× wall-time for 10× rows on semantic dedup at
    * k=8); holding the TARGET CELL SIZE constant instead keeps per-cell
    * work constant and total work linear, which is how SemDeDup/IVF run at
    * scale. */
  def autoNlist(n: Long, targetCellSize: Int = 256, minK: Int = 8): Int = {
    require(targetCellSize >= 1 && minK >= 1)
    math.max(minK.toLong, (n + targetCellSize - 1) / targetCellSize)
      .min(Int.MaxValue).toInt
  }

  /** The embeddings of the k lowest ids as a codebook — the deterministic
    * seed-point init every oracled clustering path shares (lloydTrain
    * iteration 0, the q_knn_ivf_portable quantizer, semantic dedup's
    * buckets). One definition so the "ids 0..k−1, ascending, as double"
    * contract can't drift between them and their oracle CTEs. */
  def seedCentroids(corpus: DataFrame, idCol: String, embCol: String,
                    k: Int): Array[Array[Double]] = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val cs: Array[Array[Double]] = corpus.filter(col(idCol) < k).orderBy(idCol)
      .select(col(embCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(cs.length == k, s"need ids 0..${k - 1} present for seeding (got ${cs.length})")
    cs
  }

  /** Squared L2 distance to one centroid literal. */
  private def sqDist(emb: Column, centroid: Array[Double]): Column = {
    val c = array(centroid.map(lit): _*)
    aggregate(zip_with(emb, c, (x, y) => {
      val d = x.cast("double") - y
      d * d
    }), lit(0.0), (acc, v) => acc + v)
  }

  /** Nearest-centroid cell id: the codegen'd [[graft.functions.NearestCell]]
    * kernel (squared-L2 argmin, lowest-cell tiebreak). */
  def cellOf(emb: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.NearestCell(emb, centroids)

  /** The composed-builtin formulation of [[cellOf]] — k interpreted
    * `aggregate(zip_with(...))` distances, first-position argmin. Kept as
    * the reference semantics the kernel is asserted identical to
    * (`NearestCellSpec`); not on any query path. */
  private[graft] def cellOfComposed(emb: Column, centroids: Array[Array[Double]]): Column = {
    val dists = array(centroids.map(c => sqDist(emb, c)): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** The `nprobe` nearest cell ids, closest first — queries probe several
    * cells to recover neighbors that fell just across a Voronoi boundary
    * (the standard IVF recall lever; the corpus stays bucketed once). */
  def cellsOf(emb: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    require(nprobe >= 1 && nprobe <= centroids.length)
    val dists = array(centroids.map(c => sqDist(emb, c)): _*)
    // rank cells by distance via a sorted (dist, idx) struct array
    val tagged = array(centroids.indices.map(i =>
      struct(element_at(dists, i + 1).as("d"), lit(i).as("cell"))): _*)
    slice(transform(array_sort(tagged), s => s.getField("cell")), 1, nprobe)
  }

  /** IVF kNN: corpus bucketed ONCE by nearest centroid; each query probes
    * its `nprobe` nearest cells (exploded), candidates ranked by exact
    * cosine. A neighbor lives in exactly one cell, so probing several
    * cells cannot duplicate candidates. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame,
             centroids: Array[Array[Double]], k: Int, nprobe: Int = 1): DataFrame = {
    val cb = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      cellOf(col("embedding"), centroids).as("cell"))
    val qb = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      explode(cellsOf(col("embedding"), centroids, nprobe)).as("cell"))
    val pairs = qb.join(cb, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", Relational.roundp(Similarity.cosine(col("q_emb"), col("n_emb")), 6))
    Relational.topKPerGroup(pairs, k, Seq(col("q_id")), Seq(col("cos").desc, col("n_id")))
      .select("q_id", "n_id", "cos", "rank")
  }
}
