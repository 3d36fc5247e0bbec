package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Library-wide registry for persisted intermediates (the candidate stages
  * in `graft.dedup.Dedup` and `graft.similarity.Similarity` that feed
  * several consumers or several jobs), so library callers can release them:
  * Verify/Bench call `spark.catalog.clearCache()` per query, but a
  * long-lived session embedding these pipelines should call
  * [[unpersistAll]] after consuming a builder's result (the caching
  * contract).
  *
  * References must be STRONG — Spark's CacheManager pins a persisted plan
  * until unpersist/clearCache regardless of whether the Dataset wrapper is
  * still reachable, so a weak registry could never release it. Unbounded
  * growth is prevented by self-pruning instead: every [[track]] drops
  * entries that are no longer persisted (clearCache or a direct unpersist
  * already released them), so the registry only ever holds live cache
  * entries.
  */
object CacheRegistry {

  private val tracked = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Persist `df` and register it for a later [[unpersistAll]]. */
  def track(df: DataFrame): DataFrame = synchronized {
    tracked.filterInPlace(_.storageLevel != StorageLevel.NONE)
    tracked += df
    df.persist()
  }

  /** Unpersist every registered intermediate. Call after the actions
    * consuming a builder's result have run. */
  def unpersistAll(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
  }
}
