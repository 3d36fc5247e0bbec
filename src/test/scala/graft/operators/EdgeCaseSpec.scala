package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Regression tests for edge cases fixed by review: degenerate parameters
  * and degenerate data must degrade gracefully, not silently misbehave or
  * abort under ANSI mode. */
class EdgeCaseSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("sampleEveryN(n=1) keeps every row, not none") {
    val df = Seq((1L, t("2024-01-01 10:00:00"), 1.0), (2L, t("2024-01-01 10:00:01"), 2.0),
      (3L, t("2024-01-01 10:00:02"), 3.0)).toDF("event_id", "ts", "value")
    assert(Relational.sampleEveryN(df, 1, Nil, Seq(col("ts"), col("event_id"))).count() == 3)
    assert(Relational.sampleEveryN(df, 2, Nil, Seq(col("ts"), col("event_id")))
      .select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    intercept[IllegalArgumentException] {
      Relational.sampleEveryN(df, 0, Nil, Seq(col("ts")))
    }
  }

  test("medianUpper of an all-null group is null, not an ANSI array-index error") {
    val df = Seq((1L, Some(5.0)), (1L, Some(7.0)), (2L, None), (2L, None))
      .toDF("k", "v")
    val rows = df.groupBy(col("k")).agg(Relational.medianUpper(col("v")).as("med"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L).contains(7.0)) // upper middle of [5, 7]
    assert(rows(2L).isEmpty)
  }

  test("SlidingTopK drops null-keyed/timed/item rows instead of crashing the decode") {
    val df = Seq(
      (Some(10L), Some(t("2024-01-01 10:00:00")), Some(1L), Some("a")),
      (None, Some(t("2024-01-01 10:00:01")), Some(1L), Some("b")), // null id
      (Some(12L), None, Some(1L), Some("b")),                      // null ts
      (Some(13L), Some(t("2024-01-01 10:00:03")), Some(1L), None)) // null item
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = SlidingTopK.perEventTopK(spark, df,
      key = "user_id", id = "event_id", ts = "ts", item = "event_type",
      windowMs = 3600 * 1000, k = 3)
    assert(out.select("event_id").as[Long].collect().toSeq == Seq(10L))
  }
}
