package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Event

/** Provider portability of the keyed streaming state machines: every
  * stateful gate must produce IDENTICAL results whether its state lives in
  * the default heap-backed provider or in RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`). RocksDB is the 100 TB
  * configuration — billions of keys spill to executor-local disk with a
  * bounded block cache instead of OOMing the heap — so this spec is the
  * proof that the state machines don't accidentally depend on provider
  * internals (iteration order, in-memory identity, snapshot timing).
  */
class RocksDBStateStoreSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val confKey = "spark.sql.streaming.stateStore.providerClass"

  /** Run `body` with the session's state store provider set to `provider`
    * (plus the production companion confs for RocksDB — changelog
    * checkpointing), restoring the prior settings (or unsetting) after. */
  private def withProvider[T](provider: String)(body: => T): T = {
    val extras =
      if (provider == StateStores.RocksDBProvider) StateStores.RocksDBExtras else Map.empty
    val keys = confKey :: extras.keys.toList
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set(confKey, provider)
    extras.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally keys.foreach(k => prev(k).fold(spark.conf.unset(k))(spark.conf.set(k, _)))
  }

  private def rows(name: String): Seq[String] = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect().map(_.toString).sorted.toSeq
  }

  test("RocksDB provider actually engages (rocksdb state metrics reported)") {
    withProvider(StateStores.RocksDBProvider) {
      val dir = java.nio.file.Files.createTempDirectory("graft-rocks-probe").toString
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
        .toDF("user_id", "ts", "value").write.mode("overwrite").parquet(dir)
      val schema = spark.read.parquet(dir).schema
      val keyed = spark.readStream.schema(schema).parquet(dir)
        .as[(Long, java.sql.Timestamp, Double)]
        .map { case (u, ts, v) => (u, Event(Some(ts), Some(v))) }
      val q = StreamingOps.scanByKey[Long, Double, Double](keyed, _ + _, 0.0)
        .toDF().writeStream.format("memory").queryName("rocks_probe")
        .outputMode("append").start()
      q.processAllAvailable()
      val metrics = q.lastProgress.stateOperators
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString)).toSet
      q.stop()
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"expected RocksDB custom metrics from the state operator, got: $metrics")
    }
  }

  // One gate per distinct state layout: flatMapGroupsWithState scan
  // (single accumulator), keyed FIFO sliding windows (queue),
  // dropDuplicates (key-set), merging session windows (ranges),
  // complete-mode Misra-Gries (a TypedImperativeAggregate BINARY buffer in
  // streaming-aggregation state — serialization path the others never
  // touch), and the funnel transition machine (fixed-width array state).
  for (gate <- Seq("q_streaming_scan_bykey", "q_streaming_sliding_bykey",
                   "q_streaming_dedup", "q_streaming_session",
                   "q_streaming_frequent", "q_streaming_funnel")) {
    test(s"$gate produces identical results on the RocksDB provider") {
      val onDefault = rows(gate)
      val onRocks = withProvider(StateStores.RocksDBProvider) { rows(gate) }
      assert(onRocks.nonEmpty, s"$gate returned no rows under RocksDB")
      assert(onRocks == onDefault,
        s"$gate diverged between providers: default=${onDefault.size} rows, " +
          s"rocksdb=${onRocks.size} rows")
    }
  }

  test("StateStores env resolution: rocksdb, default, unset, junk") {
    assert(StateStores.fromEnv(Map("SPARK_GRAFT_STATE_STORE" -> "rocksdb"))
      .contains((StateStores.RocksDBProvider, StateStores.RocksDBExtras)))
    assert(StateStores.fromEnv(Map("SPARK_GRAFT_STATE_STORE" -> "default"))
      .contains((StateStores.DefaultProvider, Map.empty[String, String])))
    assert(StateStores.fromEnv(Map.empty).isEmpty)
    val e = intercept[IllegalArgumentException] {
      StateStores.fromEnv(Map("SPARK_GRAFT_STATE_STORE" -> "leveldb"))
    }
    assert(e.getMessage.contains("not a known state store"))
  }
}
