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

  /** Squared L2 distance to one centroid literal. */
  private def sqDist(emb: Column, centroid: Array[Double]): Column = {
    val c = array(centroid.map(lit): _*)
    aggregate(zip_with(emb, c, (x, y) => {
      val d = x.cast("double") - y
      d * d
    }), lit(0.0), (acc, v) => acc + v)
  }

  /** Nearest-centroid cell id as a pure expression. */
  def cellOf(emb: Column, centroids: Array[Array[Double]]): Column = {
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
