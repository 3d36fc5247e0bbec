package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The chunked replay sources' load-bearing contract: the replay arrives
  * as AT LEAST TWO data micro-batches (else no streaming gate ever
  * exercises cross-batch state carry — the property the chunked sources
  * exist for), in event-time order, covering every row exactly once.
  * Round 16 dropped the default chunk count 4 -> 2 (each extra
  * micro-batch charges ~200 ms of fixed trigger floor to every gate
  * while re-proving the same carry property); this spec is what keeps
  * that minimum from ever silently eroding to 1. */
class ChunkReplaySpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("streamEventsChunked replays as >= 2 time-ordered data micro-batches") {
    val src = Tables.streamEventsChunked(spark, dir)
    val q = src.writeStream.format("memory").queryName("chunk_replay_ev")
      .outputMode("append").start()
    q.processAllAvailable()
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    assert(dataBatches.length >= 2,
      s"replay collapsed to ${dataBatches.length} data micro-batch(es) — " +
        "cross-batch state carry is no longer exercised")
    // chunks are ts-quantile contiguous: batch row counts are roughly even
    // (no degenerate 99/1 split that would make the carry vacuous)
    val rows = dataBatches.map(_.numInputRows)
    assert(rows.min * 5 >= rows.max,
      s"degenerate chunk split: ${rows.mkString(",")}")
    // coverage: the union of batches is the whole table, no dup, no loss
    val n = Tables.events(spark, dir).count()
    assert(spark.table("chunk_replay_ev").count() == n)
    assert(spark.table("chunk_replay_ev").select("event_id").distinct().count() == n)
  }

  test("streamDocsChunked replays as >= 2 data micro-batches covering the corpus") {
    val src = Tables.streamDocsChunked(spark, dir)
    val q = src.writeStream.format("memory").queryName("chunk_replay_docs")
      .outputMode("append").start()
    q.processAllAvailable()
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    assert(dataBatches.length >= 2,
      s"docs replay collapsed to ${dataBatches.length} data micro-batch(es)")
    val n = Tables.documents(spark, dir).count()
    assert(spark.table("chunk_replay_docs").count() == n)
  }

  test("flush-sentinel replay keeps >= 2 data batches ahead of the sentinel") {
    val src = Tables.streamEventsChunkedWithFlush(spark, dir)
    val q = src.writeStream.format("memory").queryName("chunk_replay_flush")
      .outputMode("append").start()
    q.processAllAvailable()
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    // 2 data chunks + 1 sentinel batch
    assert(dataBatches.length >= 3,
      s"flush replay ran ${dataBatches.length} batches; expected 2 data + sentinel")
    val got = spark.table("chunk_replay_flush")
    assert(got.filter(col("event_id") === -1L).count() == 1)
  }
}
