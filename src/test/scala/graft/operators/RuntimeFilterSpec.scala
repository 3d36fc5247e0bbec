package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Runtime Bloom-filter join pruning — at 100 TB the cheapest shuffled row
  * is the one never shuffled: when one join side is selectively filtered,
  * Spark can build a Bloom filter from it at runtime and push membership
  * tests into the OTHER side's scan, shrinking the probe-side shuffle by
  * the filter's selectivity. The feature is size-gated by default (it
  * only pays off at scale); this spec lowers the thresholds to prove the
  * engine's plans are eligible and the rewrite fires. */
class RuntimeFilterSpec extends SparkSuite {

  test("selective dim filter injects a bloom filter into the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffled join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.queries.Tables.lineitem(spark, "/root/testdata/sf0.01")
      val o = graft.queries.Tables.orders(spark, "/root/testdata/sf0.01")
        .filter(col("o_totalprice") > 400000) // selective build side
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected:\n$optimized")
      assert(q.collect().map(_.getLong(1)).sum > 0)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
