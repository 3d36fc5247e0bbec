package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** AQE skew-join handling — the runtime complement to the manual salting in
  * [[Relational.saltedJoin]] (SaltedJoinSpec): a hot key whose shuffle
  * partition dwarfs the median gets SPLIT by AQE's OptimizeSkewedJoin, so
  * one straggler task becomes several parallel ones. At 100 TB this, plus
  * salting for the pathological cases, is what keeps skewed joins alive. */
class AqeSkewSpec extends SparkSuite {
  import spark.implicits._

  test("AQE splits a skewed shuffle-join partition (skew=true in the final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // local-scale thresholds so a ~MB hot partition counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // hot key 1 carries ~99% of rows, padded to give it real bytes
      val fact = spark.range(100000)
        .select(
          when(col("id") < 99000, lit(1L)).otherwise(pmod(col("id"), lit(100L)) + 2).as("k"),
          concat(lit("x"), col("id").cast("string"), lit("p" * 64)).as("payload"))
      val dim = spark.range(200).select(col("id").as("k"), (col("id") * 10).as("v"))

      val joined = fact.join(dim, "k")
      // collect() drives THIS Dataset's QueryExecution, so the adaptive
      // plan below reflects the executed (final) form — count() would
      // build a separate aggregate QueryExecution
      val n = joined.collect().length
      assert(n == 100000) // every fact key (1..101) exists in dim (0..199)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"), plan.take(1500))
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }
}
