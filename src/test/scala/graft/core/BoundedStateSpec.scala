package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.StreamOps._
import graft.operators.SlidingTopK

/** The stateful ByKey operators must execute as secondary sort (exchange +
  * spillable in-partition sort + one streaming pass), NOT as
  * `flatMapGroups` whole-key buffering — the difference between "a hot key
  * streams through" and "a hot key OOMs the executor" at scale. */
class BoundedStateSpec extends SparkSuite {
  import spark.implicits._

  private def t(ms: Long) = new Timestamp(1704067200000L + ms)

  test("ByKey physical plans use Sort, not object-group buffering") {
    val ds = Seq(Event(Some(t(0)), Some(1)), Event(Some(t(1)), Some(2)))
      .toDS()
    val scanPlan = ds.streamScanByKey((_: Event[Int]) => 1L, (b: Int, a: Int) => b + a, 0)
      .queryExecution.executedPlan.toString
    val faccPlan = ds.streamFilterAccByKey((_: Event[Int]) => 1L, (b: Int, a: Int) => b + a, 0)((_, _) => true)
      .queryExecution.executedPlan.toString
    // two rows: a single-row relation would let Catalyst eliminate the
    // sort legitimately (maxRows <= 1) and void the assertion
    val topkPlan = SlidingTopK.perEventTopK(spark,
        Seq((1L, 1L, t(0), "a"), (1L, 2L, t(1), "b"))
          .toDF("user_id", "event_id", "ts", "event_type"),
        "user_id", "event_id", "ts", "event_type", 1000L, 1)
      .queryExecution.executedPlan.toString
    for (p <- Seq(scanPlan, faccPlan, topkPlan)) {
      assert(p.contains("Sort"), p.take(400))
      assert(!p.contains("FlatMapGroups"), p.take(400))
    }
  }

  test("a skewed key far larger than any plausible group buffer streams through") {
    // one key with 200k events, tiny window: state must stay O(window).
    // (With whole-key buffering this still *passes* at this size — the
    // structural assertion above is the real guard — but it exercises the
    // key-run reset + eviction logic on a long run.)
    val n = 200000
    val df = spark.range(n.toLong)
      .select(
        lit(7L).as("user_id"),
        col("id").as("event_id"),
        timestamp_micros(lit(1704067200000000L) + col("id") * 1000000L).as("ts"),
        concat(lit("t"), pmod(col("id"), lit(3))).as("event_type"))
    val out = SlidingTopK.perEventTopK(spark, df,
      "user_id", "event_id", "ts", "event_type", windowMs = 10000L, k = 1)
    assert(out.count() == n.toLong)
    // steady state: window holds 11 events (ids i-10..i), mod-3 items →
    // counts {4,4,3}; top-1 count must be 4 for late events
    val last = out.filter(col("event_id") === (n - 1)).collect()(0)
    assert(last.getLong(4) == 4L)
  }

  test("streamScanByKey/streamFilterAccByKey stream a 200k-event hot key with O(1) state") {
    // ONE key carrying 200k events — far beyond any plausible whole-group
    // buffer. The secondary-sort formulation keeps only the accumulator as
    // operator state (the sort itself spills through Spark's external
    // sorter), so the hot key streams through; a flatMapGroups formulation
    // would materialize the whole key in memory (the structural test above
    // is the guard that we never regress to one).
    val n = 200000
    val base = 1704067200000L // local: the closure must not capture the suite
    val ds = spark.range(n.toLong)
      .map(i => Event(Some(new Timestamp(base + i * 1000L)), Some(1)))
    val sums = ds.streamScanByKey((_: Event[Int]) => 7L, (b: Long, a: Int) => b + a, 0L)
    assert(sums.count() == n.toLong)
    // the running sum is 1..n exactly once each — final value n appears once
    assert(sums.flatMap(_.value.toSeq).filter(_ == n.toLong).count() == 1)
    val kept = ds.streamFilterAccByKey(
      (_: Event[Int]) => 7L, (b: Long, _: Int) => b + 1, 0L)((_, seen) => seen % 1000L == 0L)
    // keeps events number 0, 1000, 2000, ... (seen-so-far counter)
    assert(kept.count() == (n / 1000).toLong)
  }

  test("ByKey operators reset state between key-runs and keep per-key results") {
    // two keys that necessarily land in adjacent runs of some partition
    val ds = ((1 to 50).map(i => (1L, Event(Some(t(i * 1000L)), Some(1)))) ++
      (1 to 30).map(i => (2L, Event(Some(t(i * 1000L)), Some(7)))))
      .map { case (k, e) => Event(e.time, Some((k, e.value.get))) }
      .toDS()
    val sums = ds.streamScanByKey((e: Event[(Long, Int)]) => e.value.get._1,
        (b: Int, a: (Long, Int)) => b + a._2, 0)
      .collect().flatMap(_.value)
    // running sums must restart per key: key 1 tops at 50 (fifty 1s),
    // key 2 at 210 (thirty 7s; 50 is not a multiple of 7 — no collision)
    assert(sums.max == 210)
    assert(sums.count(_ == 50) == 1)
    assert(sums.count(_ == 210) == 1)
  }
}
