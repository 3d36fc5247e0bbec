package graft.plans.catalyst

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.similarity.Similarity

/** The native kernels registered as SQL functions by [[GraftExtensions]]
  * must agree with their Column-API forms. */
class SqlFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("cosine_similarity is callable from SQL and matches the Column form") {
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.limit(50).createOrReplaceTempView("sqlfn_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, cosine_similarity(embedding, embedding) AS c FROM sqlfn_emb")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaCol = spark.table("sqlfn_emb")
      .select(col("vec_id"), Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaCol)
    assert(viaSql.values.forall(c => math.abs(c - 1.0) < 1e-6))
  }

  test("shingle_hash64 is callable from SQL with a literal n") {
    val docs = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      "SELECT shingle_hash64(filter(split(text, '\\\\s+'), t -> t <> ''), 3) AS hs FROM sqlfn_docs")
      .collect().head.getSeq[Long](0)
    val viaCol = docs.select(
      graft.dedup.Dedup.wordNgramHashes(col("text"), 3).as("hs"))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaCol)
    assert(viaSql.length == 3)
  }

  test("srp_buckets is callable from SQL and matches the Column form") {
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.limit(20).createOrReplaceTempView("sqlfn_emb2")
    val viaSql = spark.sql(
      "SELECT vec_id, srp_buckets(embedding, 64, 6, 8) AS b FROM sqlfn_emb2")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCol = spark.table("sqlfn_emb2")
      .select(col("vec_id"), Similarity.srpTableBuckets(col("embedding"), 64, 6, 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaCol)
  }

  test("non-literal static parameters are rejected with a clear error") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("sqlfn_docs2")
    val ex = intercept[Exception] {
      spark.sql(
        "SELECT shingle_hash64(split(text, ' '), CAST(doc_id AS INT)) FROM sqlfn_docs2")
        .collect()
    }
    assert(ex.getMessage.contains("literal integer"))
  }
}
