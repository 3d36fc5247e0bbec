package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words about spark engines and queries"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "tiny")) // < n tokens
    .toDF("doc_id", "text")

  test("exactDupGroups groups identical texts under the min id") {
    val out = Dedup.exactDupGroups(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out.contains((1L, 2L))) // keeper 1, two copies
    assert(out.count(_._2 == 1L) == 3)
  }

  test("wordNgrams builds distinct order-sensitive shingles; short docs empty") {
    val out = docs.select(col("doc_id"), Dedup.wordNgrams(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).contains("the quick brown"))
    assert(out(1L).length == 7) // 9 tokens → 7 trigrams
    assert(out(5L).isEmpty)
  }

  test("ngramJaccardPairs finds near-dups and exact dups with correct jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, maxDf = 10, minJaccard = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(pairs((1L, 4L)) == 1.0) // exact duplicate
    assert(pairs((1L, 2L)) > 0.5 && pairs((1L, 2L)) < 1.0) // near-dup
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash signatures: identical docs identical; similar docs mostly agree") {
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), n = 3, numPerms = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(4L))
    val agree12 = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b } / 32.0
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } / 32.0
    assert(agree12 > agree13) // minhash agreement tracks jaccard
    assert(!sigs.contains(5L)) // no shingles → dropped
  }

  test("minhash LSH banding surfaces the exact-dup pair") {
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), n = 3, numPerms = 32)
    val cands = Dedup.minhashLshCandidates(sigs, numPerms = 32, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = cands.find(c => c._1 == 1L && c._2 == 4L)
    assert(exact.exists(_._3 == 8L)) // identical signature → all 8 bands shared
  }

  test("simhash: exact dups equal; near-dups closer in hamming than unrelated") {
    val fps = Dedup.simhash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(1L) == fps(4L))
    assert(ham(fps(1L), fps(2L)) < ham(fps(1L), fps(3L)))
  }
}
