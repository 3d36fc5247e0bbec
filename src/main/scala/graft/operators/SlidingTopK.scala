package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-event sliding-window top-k by frequency — the taxi Q1 semantics
  * (`streamWindow (slidingTime …) ≫ streamMap (topk 10)`,
  * `examples/taxi/Taxi.hs:172-178`): EVERY event emits the k most frequent
  * items in its trailing time window.
  *
  * This is the operator SQL window frames cannot express (a frame can
  * aggregate, but not rank-within-frame), and materializing each window
  * via collect_list is the O(n·w) blow-up SURVEY §7.4 warns about. Instead:
  * an incremental two-pointer pass per key — events arrive time-sorted,
  * a frequency map is maintained by adding the entering event and evicting
  * events older than the window, and each event emits the current top-k.
  * O(n·distinct) worst case, O(n·k) typical; state is one window of events
  * per key. Keys process independently (flatMapGroups), so the operator
  * scales by key-sharding exactly like the other stateful operators.
  */
object SlidingTopK {

  /** @param df      input rows
    * @param key     long grouping column name (stream shard key)
    * @param id      long row-id column name (ties + output identity)
    * @param ts      timestamp column name (event time)
    * @param item    string item column name (what gets ranked)
    * @param windowMs trailing window [t−windowMs, t], closed bounds
    * @param k       ranks to emit per event
    * @return rows (key, id, rank, item, n) — rank 1..k by (count desc, item)
    */
  def perEventTopK(spark: SparkSession, df: DataFrame,
                   key: String, id: String, ts: String, item: String,
                   windowMs: Long, k: Int): DataFrame = {
    import spark.implicits._
    df.select(col(key).cast("long"), col(id).cast("long"),
        unix_micros(col(ts)), col(item).cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (keyVal: Long, it: Iterator[(Long, Long, Long, String)]) =>
        val events = it.toArray.sortBy(e => (e._3, e._2)) // (ts, id)
        val freq = mutable.HashMap.empty[String, Int]
        val out = mutable.ArrayBuffer.empty[(Long, Long, Int, String, Long)]
        var tail = 0
        val winUs = windowMs * 1000
        events.foreach { case (_, eid, t, itemVal) =>
          freq.updateWith(itemVal)(c => Some(c.getOrElse(0) + 1))
          while (events(tail)._3 < t - winUs) {
            val old = events(tail)._4
            freq.updateWith(old)(c => c.flatMap(x => if (x > 1) Some(x - 1) else None))
            tail += 1
          }
          val top = freq.toSeq.sortBy { case (i, n) => (-n, i) }.take(k)
          top.zipWithIndex.foreach { case ((i, n), r) =>
            out += ((keyVal, eid, r + 1, i, n.toLong))
          }
        }
        out.iterator
      }
      .toDF(key, id, "rank", item, "n")
  }
}
