package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.similarity.Ivf

/** The [[NearestCell]] kernel must pick the same cell as the composed
  * `array_position`/`array_min` over `aggregate(zip_with(...))` distances
  * ([[Ivf.cellOfComposed]]) on well-formed embeddings — same fold order,
  * same lowest-cell tiebreak — while being codegen-able.
  */
class NearestCellSpec extends SparkSuite {

  test("kernel matches the composed formulation on real testdata") {
    val e = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val cs = Ivf.lloydTrain(e, "vec_id", "embedding", k = 8, iters = 1)
    val diff = e.select(
        Ivf.cellOf(col("embedding"), cs).as("kernel"),
        Ivf.cellOfComposed(col("embedding"), cs).as("composed"))
      .filter(col("kernel") =!= col("composed"))
      .count()
    assert(diff == 0L)
  }

  test("exact ties go to the lowest cell; null embedding yields null") {
    import spark.implicits._
    val cs = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(Some(Array(1.0f, 0.0f)), Some(Array(0.0f, 1.0f)), None)
      .toDF("embedding")
      .select(Ivf.cellOf(col("embedding"), cs).as("cell"))
    assert(df.collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq == Seq(0, 2, -1))
  }
}
