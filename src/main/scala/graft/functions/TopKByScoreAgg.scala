package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Map-side-combinable exact top-k: keep the k best (score, id) pairs per
  * group with BOUNDED state — the scale path for per-group ranking.
  *
  * The window formulation ([[graft.operators.Relational.topKPerGroup]])
  * shuffles EVERY row to its group's partition and sorts there; this
  * aggregator's partial state is ≤ k pairs per group per task, so the
  * map side combines before the exchange and the shuffle moves at most
  * k·groups·tasks pairs — at a 100 TB corpus with small k that is the
  * difference between moving the corpus and moving kilobytes per task.
  *
  * Ordering: score DESC, id ASC on ties (the library's standard
  * deterministic tiebreak). The buffer is a sorted-ascending List (worst
  * kept at the head for O(1) comparison, O(k) insert) — for ranking-sized
  * k (tens), insertion into an immutable list beats heap constant factors
  * and encodes cheaply. `finish` returns the pairs best-first.
  */
class TopKByScoreAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive (got $k)")

  /** true when a ranks strictly better than b: higher score, or equal
    * score and smaller id. Scores compare in the total order Spark's sort
    * uses (NaN above every double, -0.0 == 0.0): a raw `>` would let a NaN
    * at the buffer head poison the aggregate (better(x, NaN) false for all
    * x), silently diverging from the window formulation it must match. */
  private def cmpScore(x: Double, y: Double): Int =
    java.lang.Double.compare(if (x == 0.0d) 0.0d else x, if (y == 0.0d) 0.0d else y)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = cmpScore(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: List[(Double, Long)] = Nil

  private def insert(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] = {
    // ascending by "badness": head is the current worst
    val (worse, rest) = b.span(x => better(a, x))
    worse ::: a :: rest
  }

  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    if (b.lengthCompare(k) < 0) insert(b, a)
    else if (better(a, b.head)) insert(b.tail, a)
    else b

  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    b2.foldLeft(b1)(reduce)

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r.reverse

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  def column: TypedColumn[(Double, Long), Seq[(Double, Long)]] = toColumn.name("topk")
}
