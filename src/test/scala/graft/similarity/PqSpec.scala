package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Product quantization ([[Pq]]): codebook construction, encode identity
  * on the seed vectors, and the structural ADC contract on real testdata. */
class PqSpec extends SparkSuite {

  private lazy val emb =
    graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("seedCodebooks slices the seed vectors into m × ksub × dsub") {
    val cbs = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8)
    assert(cbs.length == 4)
    assert(cbs.forall(_.length == 8))
    assert(cbs.forall(_.forall(_.length == 16)))
    // subspace 1's codeword j is dims 16..31 of seed vector j
    val seeds = Ivf.seedCentroids(emb, "vec_id", "embedding", 8)
    assert(cbs(1)(3).toSeq == seeds(3).slice(16, 32).toSeq)
  }

  test("a seed vector encodes to its own code in every subspace") {
    val cbs = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val codes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id") +: Pq.encodeCols(col("embedding"), cbs): _*)
      .collect()
    // distance to its own subvector is exactly 0, and real embeddings have
    // no duplicate subvectors, so argmin must pick the vector's own id
    codes.foreach { r =>
      val id = r.getLong(0).toInt
      (1 to 4).foreach(m => assert(r.getInt(m) == id,
        s"vec $id subspace ${m - 1} encoded to ${r.getInt(m)}"))
    }
  }

  test("adcKnn emits dense ranks with non-decreasing adc per query") {
    val cbs = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val out = Pq.adcKnn(emb, emb.filter(col("vec_id") < 10), cbs, k = 5).collect()
    assert(out.length == 50)
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 5))
      assert(sorted.forall(_.getLong(1) != q), "a query must not match itself")
      val adcs = sorted.map(_.getDouble(2))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b })
      assert(adcs.forall(_ >= 0.0))
    }
  }

  test("ivfpqKnn returns only neighbors from probed cells, adc consistent with the full scan") {
    val cbs = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val centroids = Ivf.seedCentroids(emb, "vec_id", "embedding", 8)
    val cells = emb.select(col("vec_id"),
        Ivf.cellOf(col("embedding"), centroids).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), Ivf.cellsOf(col("embedding"), centroids, 2).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    val out = Pq.ivfpqKnn(emb, emb.filter(col("vec_id") < 10), centroids, cbs,
      k = 5, nprobe = 2).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(probes(q).contains(cells(n)),
        s"neighbor $n (cell ${cells(n)}) outside query $q's probed cells ${probes(q)}")
    }
    // the adc of a surviving pair must equal the full-scan path's adc —
    // cell pruning changes WHICH pairs exist, never their distance
    val full = Pq.adcKnn(emb, emb.filter(col("vec_id") < 10), cbs, k = Int.MaxValue - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      assert(full((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
  }

  test("ADC ranking recovers exact-squared-L2 neighbors better than chance") {
    // PQ is approximate; with seed-point codebooks we only assert the
    // compressed-domain ranking carries real signal: mean recall@5 vs the
    // exact squared-L2 top-5 must beat the ~5/n random-overlap floor by 5×
    val cbs = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val approx = Pq.adcKnn(emb, emb.filter(col("vec_id") < 10), cbs, k = 5)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val n = vecs.size
    val recalls = (0L until 10L).map { q =>
      val exact = vecs.filter(_._1 != q).toSeq
        .sortBy { case (id, v) => (d2(vecs(q), v), id) }.take(5).map(_._1).toSet
      approx(q).intersect(exact).size / 5.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean > 5.0 * 5.0 / n, s"mean recall@5 $mean vs random floor ${5.0 / n}")
  }
}
