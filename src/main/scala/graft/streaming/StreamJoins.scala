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
