package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-query ingress/egress counters via `StreamingQueryListener` — the
  * Spark analog of the reference's per-node Prometheus metrics
  * (events/bytes counters and connection gauges, `Nodes.hs:324-338`,
  * `Nodes/Types.hs:19-26`). Counters accumulate rows processed and last
  * observed input/processing rates per query name. */
final class Metrics extends StreamingQueryListener {

  final case class QueryStats(
      rowsProcessed: Long,
      lastInputRowsPerSec: Double,
      lastProcessedRowsPerSec: Double,
      batches: Long)

  private val stats = new ConcurrentHashMap[String, QueryStats]()

  def snapshot: Map[String, QueryStats] = {
    val b = Map.newBuilder[String, QueryStats]
    stats.forEach((k, v) => b += k -> v)
    b.result()
  }

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit =
    // name is null for queries started without .queryName(...) — mirror
    // onQueryProgress's id fallback (ConcurrentHashMap rejects null keys)
    stats.putIfAbsent(Option(event.name).getOrElse(event.id.toString), QueryStats(0, 0, 0, 0))

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    stats.merge(name,
      QueryStats(p.numInputRows, p.inputRowsPerSecond, p.processedRowsPerSecond, 1),
      (old, add) => QueryStats(
        old.rowsProcessed + add.rowsProcessed,
        add.lastInputRowsPerSec,
        add.lastProcessedRowsPerSec,
        old.batches + 1))
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object Metrics {
  /** Attach a fresh metrics listener to the session. */
  def attach(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    m
  }
}
