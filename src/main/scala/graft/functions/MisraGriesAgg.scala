package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary with `k` counters as a typed,
  * MERGEABLE aggregate — the deterministic-guarantee heavy-hitter sketch
  * (Misra & Gries, Sci. Comp. Prog. 1982). The merge rule is Agarwal et
  * al., "Mergeable Summaries" (PODS'12, §3): sum counters, keep the top
  * `k`, subtract the (k+1)-th largest count from the survivors. That rule
  * makes the summary safe under ANY merge tree — exactly what Spark's
  * partial aggregation (map-side combine, then reduce-side merge in
  * arbitrary order) executes — while preserving the two MG guarantees over
  * the total item count n:
  *
  *  (a) every item with true frequency > n/(k+1) holds a counter, and
  *  (b) counters never overcount; each undercounts by ≤ n/(k+1).
  *
  * State is O(k) regardless of input size: the 100 TB path for "which
  * items exceed an ε-fraction" (ε = 1/(k+1)), where an exact groupBy would
  * shuffle every distinct item. Used two-pass in `q_frequent_words`: MG
  * proposes ≤k candidates, one exact pass verifies — the emitted set is
  * provably EXACTLY the items above threshold (a candidate miss is
  * impossible by (a)), so the query is fully oracle-checkable even though
  * the sketch itself isn't SQL-portable.
  *
  * Insertion cost is amortized O(1) map ops: the buffer runs to 2k before
  * one O(k log k) merge-style compaction — the classic decrement-all-per-
  * non-resident-item form costs O(k) per insert and would dominate a
  * token-scale scan.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]]
    with Serializable {
  require(k > 0, s"Misra-Gries needs a positive counter budget (got $k)")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** PODS'12 merge-compaction: subtract the (k+1)-th largest count, drop
    * non-positive. Survivors are the ≤k items strictly above that count
    * (ties at it drop), so the post-state is always ≤k counters. */
  private def compact(b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    if (b.size > k) {
      val counts = b.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - (k + 1))
      b.filterInPlace((_, v) => v > m)
      b.mapValuesInPlace((_, v) => v - m)
    }
    b
  }

  override def reduce(b: mutable.HashMap[String, Long], a: String): mutable.HashMap[String, Long] = {
    b.update(a, b.getOrElse(a, 0L) + 1L)
    if (b.size > 2 * k) compact(b) else b
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    small.foreach { case (key, v) => big.update(key, big.getOrElse(key, 0L) + v) }
    compact(big)
  }

  override def finish(r: mutable.HashMap[String, Long]): Map[String, Long] =
    compact(r).toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
