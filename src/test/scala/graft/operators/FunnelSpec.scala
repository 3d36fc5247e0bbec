package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Relational.funnelStages]]: ordered-sequence semantics (strictly-after
  * advancement, nulls from the first unreached stage) and the single-
  * exchange plan contract. */
class FunnelSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val events = {
    import spark.implicits._
    Seq(
      // user 1: clean view(1) → click(2) → purchase(3)
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      // user 2: click BEFORE the first view never counts; no click after
      // the view, so the purchase (after nothing) is unreachable too
      (2L, 1L, "click"), (2L, 2L, "view"), (2L, 3L, "purchase"),
      // user 3: click at the SAME ts as the view — strictly-after, so no
      (3L, 1L, "view"), (3L, 1L, "click"),
      // user 4: two full paths; stage times are the earliest valid ones
      (4L, 5L, "view"), (4L, 6L, "click"), (4L, 9L, "purchase"),
      (4L, 1L, "view"), (4L, 7L, "click"), (4L, 8L, "purchase"),
      // user 5: purchase only — stage 1 never entered
      (5L, 1L, "purchase")
    ).map { case (u, t, e) => (u, ts(t), e) }.toDF("user_id", "ts", "event_type")
  }

  private lazy val out = Relational.funnelStages(events,
      col("user_id"), col("ts"), col("event_type"),
      Seq("view", "click", "purchase"))
    .collect().map(r => r.getLong(0) ->
      (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap

  test("a user advances only via strictly-later events, in stage order") {
    assert(out(1L) == (Some(ts(1)), Some(ts(2)), Some(ts(3))))
    assert(out(2L) == (Some(ts(2)), None, None))
    assert(out(3L) == (Some(ts(1)), None, None))
    assert(out(5L) == (None, None, None))
  }

  test("stage times are the earliest valid ones, not the first path's") {
    // m1 = 1 (earliest view); m2 = 6 (earliest click after 1); m3 = 8
    // (earliest purchase after 6 — the 9 belongs to the slower path)
    assert(out(4L) == (Some(ts(1)), Some(ts(6)), Some(ts(8))))
  }

  test("the chained stage windows share one hash exchange") {
    val plan = Relational.funnelStages(events,
      col("user_id"), col("ts"), col("event_type"),
      Seq("view", "click", "purchase")).queryExecution.executedPlan
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size == 1,
      s"expected ONE exchange for 3 chained stage windows + reduction, got ${exchanges.size}")
  }
}
