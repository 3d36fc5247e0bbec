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
    * `FunctionalProcessing.hs:175-178`). Equal-duration convenience form of
    * the two-duration overload below. */
  def windowAggJoin(left: DataFrame, right: DataFrame,
                    tsLeft: String, tsRight: String,
                    duration: String, watermark: String,
                    leftAggs: Seq[Column], rightAggs: Seq[Column]): DataFrame =
    windowAggJoin(left, right, tsLeft, tsRight, duration, duration, watermark,
      leftAggs, rightAggs)

  /** `streamJoinW` with DIFFERING per-side window lengths — the reference's
    * flagship use joins a 15-min window against a 30-min window (Taxi Q2,
    * `examples/taxi/Taxi.hs:299-305`). Each side aggregates on its OWN
    * tumbling grid; the finer side is then re-bucketed into the coarser grid
    * with a nested time window (`window` over a window column buckets by
    * `window_time` = end − 1µs, so a fine window maps to the unique coarse
    * window containing it — exact because the coarser duration must be a
    * multiple of the finer). The join key is the COARSE window, which both
    * carries the event-time metadata Spark needs to bound join state by the
    * watermark and is the pairing the reference's window-level combination
    * produces. Output keeps `w` (the coarse window) plus the finer side's
    * own window (`wl`/`wr`) for callers to project.
    *
    * Scale note: both aggregates are partial (map-side combine) before their
    * window shuffle, and the join's state is one row per closed window per
    * side — O(windows in the watermark horizon), not O(events).
    *
    * `keys` adds per-key grouping (Taxi Q2 aggregates per CELL per window,
    * `Taxi.hs:269-305`): both sides group on (window, keys…) and the join
    * pairs on (coarse window, keys…). The window stays in the join key, so
    * the watermark state bound is unchanged; keys only refine the pairing. */
  def windowAggJoin(left: DataFrame, right: DataFrame,
                    tsLeft: String, tsRight: String,
                    durationLeft: String, durationRight: String,
                    watermark: String,
                    leftAggs: Seq[Column], rightAggs: Seq[Column],
                    keys: Seq[String] = Nil): DataFrame = {
    val lMs = durationMs(durationLeft)
    val rMs = durationMs(durationRight)
    val coarse = if (lMs >= rMs) durationLeft else durationRight
    require(math.max(lMs, rMs) % math.min(lMs, rMs) == 0,
      s"finer window must align into the coarser grid (got $durationLeft vs $durationRight)")
    val la0 = left.withWatermark(tsLeft, watermark)
      .groupBy(window(col(tsLeft), durationLeft).as("wl") +: keys.map(col): _*)
      .agg(leftAggs.head, leftAggs.tail: _*)
    val ra0 = right.withWatermark(tsRight, watermark)
      .groupBy(window(col(tsRight), durationRight).as("wr") +: keys.map(col): _*)
      .agg(rightAggs.head, rightAggs.tail: _*)
    val la = if (lMs < rMs) la0.withColumn("w", window(col("wl"), coarse))
             else la0.withColumnRenamed("wl", "w")
    val ra = if (rMs < lMs) ra0.withColumn("w", window(col("wr"), coarse))
             else ra0.withColumnRenamed("wr", "w")
    la.join(ra, "w" +: keys)
  }

  /** Fixed-length interval string ("15 minutes") → milliseconds. Month-based
    * units are rejected: a tumbling grid needs a fixed length. */
  private[streaming] def durationMs(d: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(d))
    require(iv.months == 0, s"month-based window duration not supported: $d")
    iv.days * 86400000L + iv.microseconds / 1000L
  }
}
