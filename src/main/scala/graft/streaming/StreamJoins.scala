package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming windowed joins: the reference's `streamJoinE` (window both
  * sides, pair windows, theta-join within the pair —
  * `FunctionalProcessing.hs:161-173`) maps to Spark's stream-stream join
  * with event-time range constraints + watermarks: events join when their
  * event times fall in the same window-sized band, and the watermark bounds
  * the buffered state on both sides. */
object StreamJoins {

  /** Stream-stream equi+interval join: rows join when keys match AND the
    * right event time is within [left - windowMs, left + windowMs]. Both
    * sides must carry an event-time column named in ts{Left,Right}. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   tsLeft: String, tsRight: String,
                   watermark: String, windowMs: Long,
                   keys: Column): DataFrame = {
    val l = left.withWatermark(tsLeft, watermark)
    val r = right.withWatermark(tsRight, watermark)
    l.join(r, keys &&
      col(tsRight) >= col(tsLeft) - expr(s"INTERVAL ${windowMs} MILLISECONDS") &&
      col(tsRight) <= col(tsLeft) + expr(s"INTERVAL ${windowMs} MILLISECONDS"))
  }

  /** `streamJoinE`-shaped streaming join (reference
    * `FunctionalProcessing.hs:161-173`: window both sides, pair equal
    * windows, cartesian theta-join within the pair): each side is bucketed
    * into its tumbling event-time window, and the stream-stream join pairs
    * rows whose WINDOWS are equal and the theta predicate holds. Window
    * equality gives Spark the state-cleanup bound it needs (both sides'
    * buffered rows are dropped once the watermark passes their window), so
    * state is O(events per window), not O(stream) — the streaming twin of
    * the batch row-level `streamJoinE` lowering. Matched pairs emit as they
    * arrive (inner join), so on a finite replay the emitted set equals the
    * batch join exactly.
    *
    * Each side's raw timestamp column is CONSUMED into its window struct
    * (the struct inherits the event-time watermark metadata, and a side
    * carrying both would have two event-time columns — Spark rejects
    * that); the joined result keeps the shared window as `w` for callers
    * to project (`w.start` = the epoch-aligned bucket start). */
  def windowThetaJoin(left: DataFrame, right: DataFrame,
                      tsLeft: String, tsRight: String,
                      duration: String, watermark: String,
                      theta: Column): DataFrame = {
    val l = left.withWatermark(tsLeft, watermark)
      .withColumn("w", window(col(tsLeft), duration)).drop(tsLeft)
    val r = right.withWatermark(tsRight, watermark)
      .withColumn("__rw", window(col(tsRight), duration)).drop(tsRight)
    l.join(r, col("w") === col("__rw") && theta).drop("__rw")
  }

  /** `streamJoinW`-shaped streaming join: aggregate both sides per tumbling
    * window, then join the window aggregates (window-level combination,
    * `FunctionalProcessing.hs:175-178`). */
  def windowAggJoin(left: DataFrame, right: DataFrame,
                    tsLeft: String, tsRight: String,
                    duration: String, watermark: String,
                    leftAggs: Seq[Column], rightAggs: Seq[Column]): DataFrame = {
    val la = left.withWatermark(tsLeft, watermark)
      .groupBy(window(col(tsLeft), duration).as("w"))
      .agg(leftAggs.head, leftAggs.tail: _*)
    val ra = right.withWatermark(tsRight, watermark)
      .groupBy(window(col(tsRight), duration).as("w"))
      .agg(rightAggs.head, rightAggs.tail: _*)
    la.join(ra, "w")
  }
}
