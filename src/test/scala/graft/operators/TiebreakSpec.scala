package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Constructed (user, ts)-tie datasets proving the oracle tiebreak rules:
  * the driver's DuckDB oracles order by (ts, event_id) everywhere, so the
  * operators must process ties in exactly that order. */
class TiebreakSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("SlidingTopK window includes same-ts events with <= event_id only") {
    // user 1: three events at the SAME timestamp with distinct ids/items.
    // Processing order is (ts, event_id), so event 11's window sees only
    // {10, 11}, not 12.
    val df = Seq(
      (10L, t("2024-01-01 10:00:00"), 1L, "a"),
      (11L, t("2024-01-01 10:00:00"), 1L, "b"),
      (12L, t("2024-01-01 10:00:00"), 1L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = SlidingTopK.perEventTopK(spark, df,
        key = "user_id", id = "event_id", ts = "ts", item = "event_type",
        windowMs = 3600 * 1000, k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getString(3), r.getLong(4)))
    // at event 10: only {a}
    assert(out.filter(_._1 == 10L).toSet == Set((10L, 1, "a", 1L)))
    // at event 11: {a:1, b:1} → rank by (count desc, item): a then b
    assert(out.filter(_._1 == 11L).sortBy(_._2).map(x => (x._3, x._4)).toSeq ==
      Seq(("a", 1L), ("b", 1L)))
    // at event 12: {a:1, b:2} → b first
    assert(out.filter(_._1 == 12L).sortBy(_._2).map(x => (x._3, x._4)).toSeq ==
      Seq(("b", 2L), ("a", 1L)))
  }

  test("session island numbering with (ts, event_id) tiebreak matches session_window on ties") {
    // Two events at the identical boundary timestamp: break-flag and
    // running-sum windows MUST use the same order or the tied row can land
    // in the wrong session (the r01 ADVICE finding).
    val df = Seq(
      (1L, t("2024-01-01 10:00:00"), 7L, 1.0),
      (2L, t("2024-01-01 10:05:00"), 7L, 2.0),
      // >= 10 min gap → new session; two rows tied at the boundary instant
      (3L, t("2024-01-01 10:20:00"), 7L, 9.0),
      (4L, t("2024-01-01 10:20:00"), 7L, 3.0))
      .toDF("event_id", "ts", "user_id", "value")

    val viaSpark = df
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("session_start"), col("user_id"), col("n"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    // gaps-and-islands with BOTH windows ordered by (ts, event_id) — the
    // oracle formulation
    df.createOrReplaceTempView("tb_events")
    val viaIslands = spark.sql(
      """WITH d AS (
        |  SELECT user_id, ts, value, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR unix_micros(ts) - unix_micros(lag(ts) OVER w) >= 600000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM tb_events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM d)
        |SELECT min(ts) AS session_start, user_id, count(*) AS n, sum(value) AS sum_value
        |FROM sess GROUP BY user_id, sid""".stripMargin)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    assert(viaSpark == viaIslands)
    assert(viaSpark.size == 2) // two sessions, tied rows in the same one
  }
}
