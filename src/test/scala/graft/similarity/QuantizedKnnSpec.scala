package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The two-stage quantized kNN (int8-code shortlist + exact re-rank):
  * degenerate-shortlist exactness, recall on the real embeddings, the
  * zero-vector guard, and the shortlist-size require. */
class QuantizedKnnSpec extends SparkSuite {

  private lazy val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  test("shortlist = corpus size degenerates to exact brute-force kNN") {
    val n = emb.count().toInt
    val quant = Similarity.quantizedKnn(emb, queries, k = 5, shortlist = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = Similarity.bruteForceKnn(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(quant == brute, "with an exhaustive shortlist the re-rank IS brute force")
  }

  test("shortlist-20 recall vs brute force is high on the real embeddings") {
    val quant = Similarity.quantizedKnn(emb, queries, k = 5, shortlist = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceKnn(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = quant.intersect(brute).size.toDouble / brute.size
    // int8 cosine error is ~1/127 per side; a 4x shortlist absorbs it
    assert(recall >= 0.9, s"recall $recall below 0.9 — quantized shortlist too lossy")
    // and the surviving pairs' cosines are the EXACT ones (re-rank at full precision)
    val bruteCos = Similarity.bruteForceKnn(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.quantizedKnn(emb, queries, k = 5, shortlist = 20).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteCos.get(key).foreach(c =>
        assert(c == r.getDouble(2), s"re-ranked cos for $key not the exact one"))
    }
  }

  test("zero vectors pin BOTH stages' cosine to -2 (NaN would sort first under desc)") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(0f, 0f)),      // zero vector -> q2 = 0 -> cos would be 0/0
      (1L, Array(1f, 0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizedKnn(corpus, corpus.filter($"vec_id" === 1), k = 3, shortlist = 3)
      .collect().sortBy(_.getInt(3))
      .map(r => (r.getLong(1), r.getDouble(2)))
    // exact order: real neighbors by true cosine, the zero vector dead last
    // at the -2 sentinel — NOT rank 1 via NaN
    assert(out.map(_._1).toSeq == Seq(2L, 3L, 0L),
      s"zero vector mis-ranked: ${out.mkString(", ")}")
    assert(out.last._2 == -2.0)
    assert(!out.exists(_._2.isNaN))
  }

  test("shortlist < k is rejected loudly") {
    intercept[IllegalArgumentException] {
      Similarity.quantizedKnn(emb, queries, k = 5, shortlist = 3)
    }
  }
}
