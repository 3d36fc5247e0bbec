package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Feasibility probe: Spark 4 chained stateful operators — two windowed
  * aggregations joined stream-stream (the streaming streamJoinW shape,
  * StreamJoins.windowAggJoin). Pins which windows of a finite AvailableNow
  * replay actually emit in append mode, so a driver gate's oracle can
  * exclude exactly those. */
class WindowAggJoinStreamSpec extends SparkSuite {

  test("windowAggJoin runs as a streaming aggregate-join chain and matches batch on closed windows") {
    val eventsBatch = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val replayDir = Files.createTempDirectory("graft-waj").toString
    eventsBatch.write.mode("overwrite").parquet(replayDir)
    val stream = spark.readStream.schema(eventsBatch.schema).parquet(replayDir)
    val joined = StreamJoins.windowAggJoin(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "purchase"),
      tsLeft = "ts", tsRight = "ts", duration = "1 hour", watermark = "1 minute",
      leftAggs = Seq(count(lit(1)).as("n_clicks")),
      rightAggs = Seq(count(lit(1)).as("n_purchases")))
    val q = joined
      .select(col("w.start").as("window_start"), col("n_clicks"), col("n_purchases"))
      .writeStream.format("memory").queryName("waj_test").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("waj_test")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet

    // batch truth over ALL windows; the streaming run may withhold windows
    // the final watermark has not passed — got must be a subset that
    // includes every window closed by (max ts - 1 minute)
    val c = eventsBatch.filter(col("event_type") === "click")
      .groupBy(window(col("ts"), "1 hour").as("w")).agg(count(lit(1)).as("n_clicks"))
    val p = eventsBatch.filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "1 hour").as("w")).agg(count(lit(1)).as("n_purchases"))
    val all = c.join(p, "w")
      .select(col("w.start"), col("w.end"), col("n_clicks"), col("n_purchases"))
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    val maxTs = eventsBatch.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val horizon = maxTs.getTime - 60000L
    val mustEmit = all.filter(_._2.getTime <= horizon).map(t => (t._1, t._3, t._4)).toSet
    val batchAll = all.map(t => (t._1, t._3, t._4)).toSet
    assert(got.subsetOf(batchAll), s"streaming emitted windows absent from batch: ${got -- batchAll}")
    assert(mustEmit.subsetOf(got),
      s"windows provably closed by the watermark did not emit: ${mustEmit -- got}")
    assert(got.nonEmpty)
  }

  test("windowAggJoin with differing durations pairs each fine window with its containing coarse window") {
    val eventsBatch = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val replayDir = Files.createTempDirectory("graft-waj2").toString
    eventsBatch.write.mode("overwrite").parquet(replayDir)
    val stream = spark.readStream.schema(eventsBatch.schema).parquet(replayDir)
    // left = FINE (30 min), right = COARSE (1 hour): the Taxi Q2 shape
    val joined = StreamJoins.windowAggJoin(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "purchase"),
      tsLeft = "ts", tsRight = "ts",
      durationLeft = "30 minutes", durationRight = "1 hour",
      watermark = "1 minute",
      leftAggs = Seq(count(lit(1)).as("n_clicks")),
      rightAggs = Seq(count(lit(1)).as("n_purchases")))
    val q = joined
      .select(col("w.start").as("coarse_start"), col("wl.start").as("fine_start"),
        col("n_clicks"), col("n_purchases"))
      .writeStream.format("memory").queryName("waj2_test").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("waj2_test").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet

    // every emitted fine window must start inside its coarse partner
    got.foreach { case (cs, fs, _, _) =>
      assert(fs.getTime >= cs.getTime && fs.getTime < cs.getTime + 3600000L,
        s"fine window $fs not contained in coarse window starting $cs")
    }
    // batch truth: 30-min click counts joined to the hour bucket's purchase count
    val c = eventsBatch.filter(col("event_type") === "click")
      .groupBy(window(col("ts"), "30 minutes").as("wl")).agg(count(lit(1)).as("n_clicks"))
      .withColumn("h", window(col("wl"), "1 hour"))
    val p = eventsBatch.filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "1 hour").as("h")).agg(count(lit(1)).as("n_purchases"))
    val all = c.join(p, "h")
      .select(col("h.start"), col("h.end"), col("wl.start"), col("n_clicks"), col("n_purchases"))
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4)))
    val maxTs = eventsBatch.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val horizon = maxTs.getTime - 60000L
    val batchAll = all.map(t => (t._1, t._3, t._4, t._5)).toSet
    // closing the COARSE window implies every contained fine window closed
    val mustEmit = all.filter(_._2.getTime <= horizon).map(t => (t._1, t._3, t._4, t._5)).toSet
    assert(got.subsetOf(batchAll), s"streaming emitted pairs absent from batch: ${got -- batchAll}")
    assert(mustEmit.subsetOf(got),
      s"pairs provably closed by the watermark did not emit: ${mustEmit -- got}")
    assert(got.nonEmpty)
  }

  test("keyed windowAggJoin groups each side per (window, key) and pairs on (coarse window, key)") {
    val eventsBatch = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val replayDir = Files.createTempDirectory("graft-waj3").toString
    eventsBatch.write.mode("overwrite").parquet(replayDir)
    val stream = spark.readStream.schema(eventsBatch.schema).parquet(replayDir)
      .withColumn("seg", pmod(col("user_id"), lit(3)))
    val joined = StreamJoins.windowAggJoin(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "purchase"),
      tsLeft = "ts", tsRight = "ts",
      durationLeft = "30 minutes", durationRight = "1 hour",
      watermark = "1 minute",
      leftAggs = Seq(count(lit(1)).as("n_clicks")),
      rightAggs = Seq(count(lit(1)).as("n_purchases")),
      keys = Seq("seg"))
    val q = joined
      .select(col("w.start").as("coarse_start"), col("wl.start").as("fine_start"),
        col("seg"), col("n_clicks"), col("n_purchases"))
      .writeStream.format("memory").queryName("waj3_test").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("waj3_test").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

    val eb = eventsBatch.withColumn("seg", pmod(col("user_id"), lit(3)))
    val c = eb.filter(col("event_type") === "click")
      .groupBy(window(col("ts"), "30 minutes").as("wl"), col("seg"))
      .agg(count(lit(1)).as("n_clicks"))
      .withColumn("h", window(col("wl"), "1 hour"))
    val p = eb.filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "1 hour").as("h"), col("seg"))
      .agg(count(lit(1)).as("n_purchases"))
    val all = c.join(p, Seq("h", "seg"))
      .select(col("h.start"), col("h.end"), col("wl.start"), col("seg"),
        col("n_clicks"), col("n_purchases"))
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val maxTs = eventsBatch.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val horizon = maxTs.getTime - 60000L
    val batchAll = all.map(t => (t._1, t._3, t._4, t._5, t._6)).toSet
    val mustEmit = all.filter(_._2.getTime <= horizon).map(t => (t._1, t._3, t._4, t._5, t._6)).toSet
    assert(got.subsetOf(batchAll), s"streaming emitted keyed pairs absent from batch: ${got -- batchAll}")
    assert(mustEmit.subsetOf(got),
      s"keyed pairs provably closed by the watermark did not emit: ${mustEmit -- got}")
    // the key must actually split the pairing: at least two distinct segs emitted
    assert(got.map(_._3).size >= 2, s"expected multiple segments, got ${got.map(_._3)}")
  }
}
