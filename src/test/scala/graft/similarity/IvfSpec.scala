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
}
