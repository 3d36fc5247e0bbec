package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, ExtraQueries, GraphQueries, RelationalQueries, SimilarityQueries, SketchQueries, StreamQueries, TaxiQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage surface: one entry per implemented
  * operator/capability from SURVEY.md §2 (stream operators on `events`,
  * relational plans on the TPC-H-ish tables, training-data text/dedup/
  * similarity pipelines on `documents`/`embeddings`). `oracleSql` carries a
  * DuckDB-equivalent for EVERY query — since round 11 the production
  * xxhash64/splitmix pipelines are replayed bit-for-bit by generated
  * wraparound-arithmetic SQL ([[graft.queries.XxhashOracleSql]]), so no
  * rows-only entries remain.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Taxi-Q1-shaped:
    * tumbling-window top-k by frequency (SURVEY §2.5 `topk`). */
  def entry(spark: SparkSession): DataFrame =
    StreamQueries.queries("q_topk_window")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ StreamQueries.queries ++
      TextQueries.queries ++ SimilarityQueries.queries ++ TaxiQueries.queries ++
      GraphQueries.queries ++ ExtraQueries.queries ++ SketchQueries.queries ++
      AnalyticsQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ StreamQueries.oracles ++
      TextQueries.oracles ++ SimilarityQueries.oracles ++ TaxiQueries.oracles ++
      GraphQueries.oracles ++ ExtraQueries.oracles ++ SketchQueries.oracles ++
      AnalyticsQueries.oracles
}
