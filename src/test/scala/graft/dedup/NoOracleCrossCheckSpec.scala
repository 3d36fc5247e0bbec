package graft.dedup

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Independent cross-checks for the driver queries that ship without a
  * DuckDB oracle (xxhash64 arithmetic is not portable): each hash-based
  * pipeline is validated against a SECOND implementation on the real
  * sf0.01 testdata — a driver-side Scala re-derivation (simhash, rolling
  * fingerprint), an exact measure it must estimate (MinHash vs true
  * Jaccard), or the exact method it approximates (LSH kNN vs brute force).
  * A hash bug that preserves row counts cannot survive these. */
class NoOracleCrossCheckSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val docs = graft.queries.Tables.documents(spark, sfDir)
  private lazy val emb = graft.queries.Tables.embeddings(spark, sfDir)

  private def toksOf(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  private def h64(s: String): Long = XXH64.hashUTF8String(UTF8String.fromString(s), 42L)

  test("simhash matches a driver-side Scala re-derivation on every sf0.01 document") {
    val got = Dedup.simhash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = docs.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.length == 500)
    texts.foreach { case (id, text) =>
      val hs = toksOf(text).map(h64)
      var fp = 0L
      var b = 0
      while (b < 64) {
        val mask = 1L << b
        val votes = hs.map(h => if ((h & mask) != 0) 1 else -1).sum
        if (votes > 0) fp |= mask
        b += 1
      }
      assert(got(id) == fp, s"doc $id")
    }
  }

  test("rolling-hash fingerprint matches a driver-side fold on every sf0.01 document") {
    val mod = 1000000007L
    val got = docs.select(col("doc_id"),
        TextAnalysis.rollingHashFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      val expected = toksOf(r.getString(1)).foldLeft(0L) { (acc, t) =>
        val ht = { val m = h64(t) % mod; if (m < 0) m + mod else m }
        val x = (acc * 257 + ht) % mod
        if (x < 0) x + mod else x
      }
      assert(got(r.getLong(0)) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("minhash signature agreement tracks exact n-gram Jaccard on sf0.01 pairs") {
    // exact Jaccard from the oracle-verified pipeline, un-pruned (maxDf
    // large enough to keep every shingle at this scale)
    val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, maxDf = 1000000, minJaccard = 0.2)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), n = 3, numPerms = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val errors = exact.toSeq.map { case ((a, b), j) =>
      val agree = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 32.0
      math.abs(agree - j)
    }
    // per-pair: within ~3 sigma of the 32-perm binomial; in aggregate tight
    assert(errors.max <= 0.3, s"worst minhash deviation ${errors.max}")
    assert(errors.sum / errors.size <= 0.1, s"mean deviation ${errors.sum / errors.size}")
  }

  test("LSH banding candidates include every high-Jaccard pair; shared-band counts are sane") {
    val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, maxDf = 1000000, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), n = 3, numPerms = 32)
    val cands = Dedup.minhashLshCandidates(sigs, numPerms = 32, rowsPerBand = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // j >= 0.8 → band-collision prob 1-(1-j^4)^8 ≈ 0.98+; deterministic
    // hashes make this a fixed property of the dataset
    exact.foreach { p => assert(cands.contains(p), s"high-jaccard pair $p missed by LSH") }
    assert(cands.values.forall(n => n >= 1 && n <= 8))
  }

  test("LSH-bucketed embedding near-dup is a subset of the exact pairs with real recall") {
    val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.42)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    val lsh = Similarity.cosineNearDupPairsLsh(emb, threshold = 0.42,
        dims = 64, planesPerTable = 6, tables = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // every LSH pair is an exact pair with the identical cosine (the exact
    // re-check guarantees no false positives)
    lsh.foreach { case (p, c) => assert(exact.get(p).contains(c), s"false positive $p") }
    // recall floor — deterministic hashes make this a fixed data property
    assert(lsh.length.toDouble / exact.size >= 0.5,
      s"near-dup recall ${lsh.length.toDouble / exact.size}")
  }

  test("portable-plane LSH near-dup (q_embedding_lsh pipeline) is a subset of exact pairs") {
    val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.42)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.cosineNearDupPairsLshPortable(emb, threshold = 0.42,
        dims = 64, planesPerTable = 4, tables = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(lsh.nonEmpty)
    // the exact re-check inside the pipeline guarantees no false positives
    // and true cosines; recall is whatever the 4x4 OR-construction gives
    // (the driver oracle replays the same buckets, so it needs no floor)
    lsh.foreach { case (p, c) => assert(exact.get(p).contains(c), s"false positive $p") }
  }

  test("SRP-LSH kNN returns true-cosine values and nonzero recall vs brute force on sf0.01") {
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceKnn(emb, queries, k = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val bruteSet = brute.map(_._1).toSet
    val bruteCos = brute.toMap
    val allCos = Similarity.bruteForceKnn(emb, queries, k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshKnn(emb, queries, dims = 64, numPlanes = 6, k = 5, tables = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(lsh.nonEmpty)
    // every LSH result's cosine must equal the exact cosine for that pair
    lsh.foreach { case (pair, cos) =>
      assert(allCos.contains(pair) && allCos(pair) == cos, s"LSH cos mismatch for $pair")
    }
    // recall floor (deterministic hashes → a fixed property of this data)
    val recall = lsh.map(_._1).count(bruteSet.contains).toDouble / bruteSet.size
    assert(recall >= 0.2, s"LSH recall $recall vs brute force")
    assert(bruteCos.nonEmpty)
  }
}
