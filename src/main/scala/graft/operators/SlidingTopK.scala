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
  * SECONDARY SORT — one hash exchange on the key, a spillable in-partition
  * sort on (key, ts, id), then one streaming pass over the key-runs keeping
  * a sliding queue of the current window and its frequency map. State is
  * O(window) per key (the queue) — never the key's whole history, so a hot
  * key streams through instead of buffering in executor memory.
  * O(n·distinct) worst case, O(n·k) typical per event.
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
    val winUs = windowMs * 1000
    // explicit names BEFORE repartition/sort: `.as[T]` does not rename
    // columns, and tuple-positional names would resolve against hidden
    // lineage (dropping the sort silently)
    df.select(col(key).cast("long").as("__k"), col(id).cast("long").as("__i"),
        unix_micros(col(ts)).as("__t"), col(item).cast("string").as("__v"))
      // unkeyed/untimed/itemless rows cannot participate in a keyed time
      // window — drop them (the typed surface's isTimed/isData gating)
      // rather than crash the non-nullable Dataset decode below
      .filter(col("__k").isNotNull && col("__i").isNotNull &&
        col("__t").isNotNull && col("__v").isNotNull)
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"), col("__i")) // (key, ts, id)
      .as[(Long, Long, Long, String)]
      .mapPartitions { it =>
        var started = false
        var curKey = 0L
        var freq = mutable.HashMap.empty[String, Int]
        var win = mutable.Queue.empty[(Long, String)] // (ts, item) in window
        it.flatMap { case (keyVal, eid, t, itemVal) =>
          if (!started || keyVal != curKey) {
            started = true; curKey = keyVal
            freq = mutable.HashMap.empty; win = mutable.Queue.empty
          }
          win.enqueue((t, itemVal))
          freq.updateWith(itemVal)(c => Some(c.getOrElse(0) + 1))
          while (win.head._1 < t - winUs) {
            val (_, old) = win.dequeue()
            freq.updateWith(old)(c => c.flatMap(x => if (x > 1) Some(x - 1) else None))
          }
          val top = freq.toSeq.sortBy { case (i, n) => (-n, i) }.take(k)
          top.zipWithIndex.map { case ((i, n), r) =>
            (curKey, eid, r + 1, i, n.toLong)
          }
        }
      }
      .toDF(key, id, "rank", item, "n")
  }
}
