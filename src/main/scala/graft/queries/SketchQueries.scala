package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch aggregates — the scale path for cardinality and quantile
  * questions a training-data pipeline asks of a 100 TB corpus ("how many
  * distinct users/tokens", "p99 latency"), where the exact forms either
  * shuffle every distinct value (count distinct) or buffer whole groups
  * (exact percentile). Both sketches keep FIXED-size mergeable state per
  * group (HyperLogLog++ registers; a Greenwald-Khanna summary), so they
  * combine map-side and move kilobytes per group regardless of row count.
  *
  * Sketch internals aren't portable to DuckDB, so these ship without an
  * oracle (driver rows-only check); SketchesSpec cross-checks both against
  * the exact answers on sf0.01 within the sketches' published error
  * bounds.
  */
object SketchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HLL++ distinct users per event type at 1% target rsd, alongside the
    // exact answer (exact is feasible at test scale; at corpus scale the
    // sketch column is the one you can afford).
    "q_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"))),

    // GK quantile summary: p50/p95/p99 of `value` per event type at
    // accuracy 10000 (rank error ≤ n/10000).
    "q_approx_quantile" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          percentile_approx(col("value"), array(lit(0.5), lit(0.95), lit(0.99)),
            lit(10000)).as("qs"),
          count(lit(1)).as("n"))
        .select(col("event_type"),
          element_at(col("qs"), 1).as("p50"),
          element_at(col("qs"), 2).as("p95"),
          element_at(col("qs"), 3).as("p99"),
          col("n")))
  )

  // no DuckDB oracle: sketch state/merge order isn't reproducible there
  val oracles: Map[String, String] = Map.empty
}
