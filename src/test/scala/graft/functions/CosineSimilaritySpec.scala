package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.similarity.Similarity

class CosineSimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("native expression matches the HOF formulation bit-for-bit") {
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .limit(2000)
    val diff = pairs.select(
        Similarity.cosineHof(col("a"), col("b")).as("hof"),
        CosineSimilarity(col("a"), col("b")).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diff == 0)
  }

  test("native expression basic values") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 1f), Array(1f, 1f))).toDF("a", "b")
    val out = df.select(round(CosineSimilarity(col("a"), col("b")), 6)).as[Double].collect().toList
    assert(out == List(1.0, 0.0, 1.0))
  }
}
