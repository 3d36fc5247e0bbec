package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSuite

class IvfSpec extends SparkSuite {

  private lazy val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("IVF: codebook trains, every vector lands in a cell, probe returns neighbors") {
    val centroids = Ivf.trainCentroids(emb, "embedding", nlist = 4)
    assert(centroids.length == 4 && centroids.head.length == 64)
    val cells = emb.select(Ivf.cellOf(col("embedding"), centroids).as("cell"))
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.keySet.subsetOf(Set(0, 1, 2, 3)))
    assert(cells.values.sum == emb.count())

    val knn = Ivf.ivfKnn(emb, emb.filter(col("vec_id") < 5), centroids, k = 3)
      .collect()
    assert(knn.nonEmpty)
    // within a probe, ranking must agree with brute force restricted to the cell
    val brute = Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 5), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    knn.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key) && brute(key) == r.getDouble(2),
        s"IVF cos for $key disagrees with brute force")
    }
  }

  test("nprobe > 1 probes the nearest cells in order and never loses recall") {
    val centroids = Ivf.trainCentroids(emb, "embedding", nlist = 4)
    val queries = emb.filter(col("vec_id") < 10)
    // cellsOf(…, 1) head must equal cellOf
    val agree = emb.select(
        Ivf.cellOf(col("embedding"), centroids).as("one"),
        element_at(Ivf.cellsOf(col("embedding"), centroids, 2), 1).as("firstOfTwo"))
      .filter(col("one") =!= col("firstOfTwo")).count()
    assert(agree == 0)

    def hits(nprobe: Int): Set[(Long, Long)] =
      Ivf.ivfKnn(emb, queries, centroids, k = 5, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = graft.similarity.Similarity.bruteForceKnn(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = hits(1).intersect(brute).size
    val r4 = hits(4).intersect(brute).size
    assert(r4 >= r1)              // monotone recall in nprobe
    assert(r4 == brute.size)      // nprobe = nlist probes everything → exact
  }

  test("Lloyd-trained codebook: absolute recall@5 floor at nprobe=2 of 8 cells") {
    // the q_knn_ivf_trained configuration on the larger corpus: usefulness,
    // not just determinism — a degenerate codebook (all vectors one cell,
    // or cells uncorrelated with cosine neighborhoods) fails the floor
    val e = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val cs = Ivf.lloydTrain(e, "vec_id", "embedding", k = 8, iters = 2)
    val queries = e.filter(col("vec_id") < 10)
    val ivf = Ivf.ivfKnn(e, queries, cs, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceKnn(e, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    info(f"recall@5 (nprobe 2/8): $recall%.3f over ${brute.size} truth pairs")
    // probing 2/8 cells blind would catch ~25% of neighbors; clustered
    // cells must do meaningfully better for IVF to be worth running
    assert(recall >= 0.5, f"recall@5 $recall%.3f under 0.5 — codebook not " +
      "concentrating cosine neighborhoods")
  }
}
