package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.multimodal.Multimodal
import graft.similarity.Similarity

class TextSimilaritySpec extends SparkSuite {
  import spark.implicits._

  /** UTF-8 text bytes standing in for a media blob (the testdata has no
    * real media; the plumbing under test never assumes a format). */
  private def fakeBlob(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("blob", encode(col("text"), "UTF-8"))

  test("tokens / counts / stopword ratio") {
    val df = Seq((1L, "the cat  and   the hat"), (2L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.stopwordRatio(TextAnalysis.tokens(col("text"))).as("r"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out(1L) == ((5, 0.6))) // the, and, the of 5
    assert(out(2L) == ((0, 0.0)))
  }

  test("token-set fingerprint is order-insensitive; rolling hash is order-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.tokenSetFingerprint(col("text")).as("setfp"),
        TextAnalysis.rollingHashFingerprint(col("text")).as("rollfp"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._1 == out(2L)._1) // same bag of words
    assert(out(1L)._1 != out(3L)._1)
    assert(out(1L)._2 != out(2L)._2) // order matters for rolling hash
  }

  test("language heuristic picks the language with most marker hits") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze und das haus"),
      (3L, "le chat et la maison des gens"),
      (4L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.langHeuristic(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "unk"))
  }

  test("brute-force kNN is exact on known vectors; LSH returns a same-cos subset") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 1),
      (3L, Array(-1f, 0f, 0f, 0f), 1)).toDF("vec_id", "embedding", "label")
    val knn = Similarity.bruteForceKnn(vecs, vecs.filter(col("vec_id") === 0), k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toList
    assert(knn.head._1 == 1L) // most similar first
    assert(knn.map(_._1) == List(1L, 2L, 3L))
    val lsh = Similarity.lshKnn(vecs, vecs.filter(col("vec_id") === 0),
      dims = 4, numPlanes = 4, k = 3).collect().map(_.getLong(1)).toSet
    assert(lsh.subsetOf(Set(1L, 2L, 3L)))
  }

  test("decode plumbing is decoder-agnostic: a drop-in custom decoder drives it") {
    // the production surface takes only real decoders (netpbm, WAV); this
    // deterministic test-scope decoder proves a third-party factory slots
    // into the same partition-batched plumbing unchanged
    val df = Seq((7L, "hello world"), (8L, "hello world"), (9L, "different")).toDF("doc_id", "text")
    val metas = Multimodal.extractMeta(spark, fakeBlob(df), TestStubDecoder)
      .collect().map(m => m.doc_id -> ((m.n_bytes, m.width, m.height, m.checksum))).toMap
    assert(metas(7L)._1 == "hello world".getBytes("UTF-8").length)
    assert(metas(7L)._4 == metas(8L)._4) // same bytes → same checksum
    assert(metas(7L)._4 != metas(9L)._4)
    assert(metas.values.forall(m => m._2 >= 64 && m._3 >= 64))
  }

  test("multimodal feature extraction: fixed-dim deterministic embeddings, ANN-composable") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, fakeBlob(df), dim = 16, TestStubDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.values.forall(_.length == 16))
    assert(feats(1L) == feats(2L)) // deterministic
    assert(feats(1L) != feats(3L))
    assert(feats.values.flatten.forall(v => v >= 0f && v <= 1f))
  }

  test("multimodal frame sampling: stride filter, last partial frame, empty blob") {
    val df = Seq(
      (1L, "a" * 200),  // 200 bytes → frames of 64: [64,64,64,8], keep idx 0,2
      (2L, "")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(fakeBlob(df), frameBytes = 64, stride = 2)
      .select(col("doc_id"), col("frame_idx"), length(col("frame")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(frames == Set((1L, 0, 64), (1L, 2, 64), (2L, 0, 0)))
  }

  test("hashedLinearScore matches an integer re-derivation via polyHashScala; empty is neutral") {
    import graft.functions.PortableHash
    val texts = Seq((1L, "spark table join stream"), (2L, "a"), (3L, ""))
    val got = texts.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.hashedLinearScore(col("text")).as("p"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    def expected(text: String): Double = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) 0.5
      else {
        val raw = toks.map(t =>
          (PortableHash.polyHashScala(t) % 1024L) * 2654435761L % 1001L - 500L).sum
        math.floor(1.0 / (1.0 + math.exp(-(raw.toDouble / toks.length / 500.0)))
          * 10000 + 0.5) / 10000
      }
    }
    texts.foreach { case (id, t) => assert(got(id) == expected(t), s"doc $id") }
    intercept[IllegalArgumentException] {
      texts.toDF("doc_id", "text")
        .select(TextAnalysis.hashedLinearScore(col("text"), buckets = 0))
    }
  }
}

/** Test-scope stand-in for an external codec: deterministic fake metadata /
  * features derived from the raw bytes. Exists to prove the
  * [[Multimodal.MediaDecoder]] plumbing is decoder-agnostic — the
  * production surface ships only real decoders. */
object TestStubDecoder extends (() => Multimodal.MediaDecoder) with Serializable {
  def apply(): Multimodal.MediaDecoder = new Multimodal.MediaDecoder {
    def decode(docId: Long, bytes: Array[Byte]): Multimodal.MediaMeta = {
      var crc = 0L
      var i = 0
      while (i < bytes.length) { crc = crc * 31 + (bytes(i) & 0xff); i += 1 }
      val w = 64 + (math.abs(crc) % 1024).toInt
      val h = 64 + (math.abs(crc >> 10) % 1024).toInt
      Multimodal.MediaMeta(docId, bytes.length, w, h, crc)
    }
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
      var d = 0
      while (d < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift per slot
        out(d) = (h & 0xffff).toFloat / 0xffff.toFloat
        d += 1
      }
      out
    }
  }
}
