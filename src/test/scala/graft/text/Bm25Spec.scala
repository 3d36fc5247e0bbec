package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

class Bm25Spec extends SparkSuite {

  import spark.implicits._

  // 4-doc corpus with known stats: N=4, dl = (4, 2, 3, 3), avgdl = 3.0
  private def corpus = Seq(
    (1L, "rare common common filler"),
    (2L, "common filler"),
    (3L, "filler filler filler"),
    (4L, "rare rare common")
  ).toDF("doc_id", "text")

  private def bm25(tf: Int, df: Int, dl: Int, n: Double = 4.0,
                   k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / 3.0))
  }

  test("scores match the hand-computed BM25 formula; ranking and tie-break by doc_id") {
    val got = Bm25.topK(corpus, col("doc_id"), col("text"),
      Seq("rare", "common"), k = 10)
      .as[(Long, Double)].collect().toList

    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    // df(rare)=2, df(common)=3; doc 3 matches neither term and must be absent
    val expected = Map(
      1L -> r4(bm25(1, 2, 4) + bm25(2, 3, 4)),
      2L -> r4(bm25(0, 2, 2) + bm25(1, 3, 2)),
      4L -> r4(bm25(2, 2, 3) + bm25(1, 3, 3)))
    assert(got.toMap == expected)
    assert(got.map(_._1) == expected.toList.sortBy { case (id, s) => (-s, id) }.map(_._1))
  }

  test("k truncates at the rounded-score boundary deterministically") {
    val got = Bm25.topK(corpus, col("doc_id"), col("text"), Seq("common"), k = 2)
      .as[(Long, Double)].collect().toList
    assert(got.size == 2)
    // doc 1 (tf=2) outranks the single-hit docs; short doc 2 beats doc 4
    assert(got.map(_._1) == List(1L, 2L))
  }

  test("zero-match query terms yield an empty result, not an error") {
    val got = Bm25.topK(corpus, col("doc_id"), col("text"), Seq("absent"), k = 5)
    assert(got.count() == 0)
  }

  test("guards: empty/duplicate terms and non-positive k are rejected") {
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, col("doc_id"), col("text"), Seq.empty, k = 5)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, col("doc_id"), col("text"), Seq("a", "a"), k = 5)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, col("doc_id"), col("text"), Seq("a"), k = 0)
    }
  }
}
