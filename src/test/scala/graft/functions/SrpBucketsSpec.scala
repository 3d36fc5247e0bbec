package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.similarity.Similarity

class SrpBucketsSpec extends SparkSuite {
  import spark.implicits._

  test("native kernel matches the HOF formulation bucket-for-bucket on real embeddings") {
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val diff = emb.select(
        Similarity.srpTableBuckets(col("embedding"), 64, 6, 8).as("native"),
        Similarity.srpTableBucketsHof(col("embedding"), 64, 6, 8).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("basic sign behavior and type checking") {
    val df = Seq(Tuple1(Array(1f, 0f, 0f, 0f)), Tuple1(Array(-1f, 0f, 0f, 0f))).toDF("e")
    val out = df.select(Similarity.srpTableBuckets(col("e"), 4, 4, 2))
      .collect().map(_.getSeq[Long](0))
    assert(out.length == 2)
    assert(out(0) != out(1)) // opposite vectors land on opposite sides
    val bad = Seq(Tuple1(Array(1.0, 0.0))).toDF("e")
    val ex = intercept[Exception] {
      bad.select(Similarity.srpTableBuckets(col("e"), 2, 2, 1)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<float>") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
