package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Cross-checks for the sketch queries (rows-only at the driver): the
  * estimates must sit inside the sketches' published error bounds of the
  * exact answers on real sf0.01 data, and the plans must partial-aggregate
  * (the whole point of a mergeable sketch). */
class SketchesSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.01"

  test("HLL++ distinct estimate within 3x the 1% target rsd of exact") {
    val rows = SketchQueries.queries("q_approx_distinct")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 5)
    rows.foreach { case (et, approx, exact) =>
      assert(exact > 0)
      val rel = math.abs(approx.toDouble - exact) / exact
      assert(rel <= 0.03, s"$et: approx=$approx exact=$exact rel=$rel")
    }
  }

  test("GK quantiles within the rank-error guarantee of exact quantiles") {
    val got = SketchQueries.queries("q_approx_quantile")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val exact = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (et, (p50, p95, p99, n)) =>
      val vs = exact(et)
      assert(n == vs.length)
      // accuracy 10000 → rank error ≤ n/10000 (< 1 at this n, allow +1 slack)
      val tol = math.max(2, n / 10000 + 1)
      def rankOf(x: Double): Int = vs.count(_ <= x)
      assert(math.abs(rankOf(p50) - 0.5 * n) <= tol, s"$et p50")
      assert(math.abs(rankOf(p95) - 0.95 * n) <= tol, s"$et p95")
      assert(math.abs(rankOf(p99) - 0.99 * n) <= tol, s"$et p99")
    }
  }

  test("sketch aggregates partial-aggregate before the exchange") {
    val plan = SketchQueries.queries("q_approx_distinct")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct") ||
      plan.toLowerCase.contains("partial"), s"no map-side combine:\n$plan")
  }
}
