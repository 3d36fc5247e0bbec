package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BucketedIOSpec extends SparkSuite {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
  }

  test("join of two co-bucketed tables runs without a shuffle exchange") {
    dropTable("li_b"); dropTable("o_b")
    val li = graft.queries.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val o = graft.queries.Tables.orders(spark, "/root/testdata/sf0.001")
    BucketedIO.writeBucketed(li.select("l_orderkey", "l_quantity"), "li_b", 4, Seq("l_orderkey"))
    BucketedIO.writeBucketed(o.select("o_orderkey", "o_totalprice"), "o_b", 4, Seq("o_orderkey"))
    // disable auto-broadcast so the planner exercises the bucketed
    // sort-merge path (at real scale neither side would broadcast)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedIO.readTable(spark, "li_b")
        .join(BucketedIO.readTable(spark, "o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      assert(joined.count() == li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
