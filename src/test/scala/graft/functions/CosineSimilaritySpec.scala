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

  test("array<double> inputs are rejected at analysis time, not silently misread") {
    val df = Seq((Array(1.0, 0.0), Array(1.0, 0.0))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(CosineSimilarity(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<float>") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("null array elements are skipped, not read as garbage") {
    val df = Seq(
      (Array[java.lang.Float](1f, null, 0f), Array[java.lang.Float](1f, 2f, 0f)))
      .toDF("a", "b")
    val out = df.select(round(CosineSimilarity(col("a"), col("b")), 6)).as[Double].collect()
    assert(out.head == 1.0) // only index 0 contributes: cos((1),(1)) = 1
  }
}
