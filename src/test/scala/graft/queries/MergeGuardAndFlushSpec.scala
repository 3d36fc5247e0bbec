package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The two round-12 correctness-infrastructure pieces that had no direct
  * spec: the lazy merge-base guard's raise_error path, and the
  * flush-sentinel replay source's construction contract. */
class MergeGuardAndFlushSpec extends SparkSuite {
  import spark.implicits._

  test("guardMergeBase passes valid ids through untouched and lazily") {
    val base = Seq((1L, "a"), (9999999L, "b")).toDF("doc_id", "text")
    val got = TextQueries.guardMergeBase(base)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (9999999L, "b")))
    // an empty base trivially passes (the old eager max() NPE'd here)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextQueries.guardMergeBase(empty).count() == 0)
  }

  test("guardMergeBase fails loudly at execution on an id >= the insert offset") {
    val base = Seq((1L, "a"), (10000001L, "bad")).toDF("doc_id", "text")
    val guarded = TextQueries.guardMergeBase(base) // construction stays lazy
    val e = intercept[Exception] { guarded.collect() }
    def chain(x: Throwable): List[Throwable] =
      Option(x).map(y => y :: chain(y.getCause)).getOrElse(Nil)
    val msg = chain(e).map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(msg.contains("insert keys would collide"), s"got: $msg")
    assert(msg.contains("10000001"), s"got: $msg")
  }

  test("flush-sentinel replay source: one extra event past max ts, schema unchanged") {
    val dir = "/root/testdata/sf0.001"
    val plain = Tables.events(spark, dir)
    val n = plain.count()
    val maxUs = plain.agg(max(unix_micros(col("ts")))).head.getLong(0)
    val src = Tables.streamEventsChunkedWithFlush(spark, dir)
    assert(src.schema == Tables.streamEventsChunked(spark, dir).schema)
    // drain the replay through a memory sink and inspect what arrived
    val q = src.writeStream.format("memory").queryName("flush_src")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("flush_src")
    assert(got.count() == n + 1, "exactly one sentinel row appended")
    val sentinel = got.filter(col("event_id") === -1L).collect()
    assert(sentinel.length == 1)
    val sUs = got.filter(col("event_id") === -1L)
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(sUs == maxUs + 3600L * 1000000L, "sentinel stamped 1h past max ts")
    // every real event unchanged
    assert(got.filter(col("event_id") >= 0).count() == n)
  }
}
