package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins [[IntArrayDot]] to the composed `aggregate(zip_with(...))` integer
  * fold it replaced in `Similarity.quantizedKnn`: integer addition is
  * exact, so agreement is plain value equality — on random int8-range code
  * arrays (the production domain), full-int-range values, negatives,
  * empties, and the self-dot (norm²) form.
  */
class IntArrayDotSpec extends SparkSuite {

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("bigint") * y), lit(0L), (acc, v) => acc + v)

  test("kernel == HOF fold on random code arrays (int8 range, negatives, empty)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      val d = if (i % 17 == 0) 0 else 64 // empties included
      (Seq.fill(d)(rnd.nextInt(255) - 127), Seq.fill(d)(rnd.nextInt(255) - 127))
    } :+ ((Seq(Int.MaxValue, -1, 7), Seq(2, Int.MinValue / 4, -7))) // wide ints
    val df = rows.toDF("a", "b")
    val out = df.select(
      IntArrayDot(col("a"), col("b")).as("k"),
      hofDot(col("a"), col("b")).as("h"),
      IntArrayDot(col("a"), col("a")).as("k2"),
      hofDot(col("a"), col("a")).as("h2")).collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"dot mismatch: $r")
      assert(r.getLong(2) == r.getLong(3), s"norm2 mismatch: $r")
    }
  }

  test("null array propagates null; type check rejects non-int arrays") {
    import spark.implicits._
    val df = Seq((Some(Seq(1, 2)), Option.empty[Seq[Int]])).toDF("a", "b")
    val r = df.select(IntArrayDot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
    val bad = intercept[Exception] {
      Seq((Seq(1.0f), Seq(1.0f))).toDF("a", "b")
        .select(IntArrayDot(col("a"), col("b"))).head()
    }
    assert(bad.getMessage.contains("int_array_dot") ||
      bad.getMessage.toLowerCase.contains("array<int>"), bad.getMessage)
  }
}
