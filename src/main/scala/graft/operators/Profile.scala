package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Relational.roundp

/** ANALYZE-style table profiling — the stats pass a pipeline runs over a
  * fresh corpus before choosing partition counts, join strategies, and
  * quality thresholds.
  */
object Profile {

  /** One-pass numeric column profile: per column the non-null count, null
    * count, exact distinct count, min, max, and mean (rounded portable).
    *
    * Plan shape: ONE aggregate over ONE scan no matter how many columns are
    * profiled — all columns' partial aggregates are map-side combined into
    * a single row, then the per-column rows are unpivoted driver-free with
    * an explode over a literal struct array (#cols rows from a 1-row
    * input — no data movement). The multi-column exact `countDistinct`
    * plans one Expand (×cols) over the scan; at 100 TB swap
    * `approx_count_distinct` in via `exactDistinct = false` and the Expand
    * disappears (HLL sketches merge map-side like the other aggregates). */
  def numericProfile(df: DataFrame, cols: Seq[String],
                     exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the dataframe: ${missing.mkString(", ")}")
    def nd(c: String): Column =
      if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"n__$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls__$c"),
        nd(c).as(s"nd__$c"),
        min(col(c)).cast("double").as(s"min__$c"),
        max(col(c)).cast("double").as(s"max__$c"),
        // 4 decimals: partial-aggregate addition order differs across
        // engines/cluster layouts; a tighter rounding of a large-magnitude
        // mean would hash-flip on the last-bit drift of the double sum
        roundp(avg(col(c)), 4).as(s"avg__$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"n__$c").as("n"),
        coalesce(col(s"nulls__$c"), lit(0L)).as("n_nulls"),
        col(s"nd__$c").as("n_distinct"),
        col(s"min__$c").as("min"),
        col(s"max__$c").as("max"),
        col(s"avg__$c").as("mean"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
