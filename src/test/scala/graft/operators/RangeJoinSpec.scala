package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `Relational.rangeJoin` — banded |Δt| ≤ tol pairing (see the operator's
  * scaladoc). The banding must produce exactly the naive theta-join's
  * pairs (each pair via exactly one band replica), through an equi-join —
  * never a nested-loop/cartesian plan. */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)
  private val tolMs = 10000L // 10s

  // deliberately includes: exact-tolerance boundary pairs (|Δt| = tol),
  // same-band and adjacent-band pairs, band-boundary straddles, and a
  // second key that must not cross-match
  private val left = Seq(
    (1L, ts(0), "l0"), (1L, ts(9), "l9"), (1L, ts(21), "l21"),
    (2L, ts(100), "m100"))
    .toDF("user_id", "ts", "ltag")
  private val right = Seq(
    (1L, ts(5), "r5"), (1L, ts(10), "r10"), (1L, ts(19), "r19"),
    (1L, ts(31), "r31"), (2L, ts(110), "s110"), (2L, ts(111), "s111"))
    .toDF("user_id", "ts", "rtag")

  private def rightSel = right.select(col("user_id"), col("ts"),
    col("rtag"), col("ts").as("rts"))

  test("matches the naive theta join exactly, each pair once") {
    val banded = Relational.rangeJoin(left, rightSel, "user_id", "ts", tolMs,
        rightCols = Seq("rtag", "rts"))
      .select("ltag", "rtag").as[(String, String)].collect().sorted.toSeq
    val naive = left.as("l").join(right.as("r"),
        col("l.user_id") === col("r.user_id") &&
          abs(unix_micros(col("l.ts")) - unix_micros(col("r.ts"))) <= tolMs * 1000)
      .select("ltag", "rtag").as[(String, String)].collect().sorted.toSeq
    assert(banded == naive)
    assert(banded.nonEmpty)
    assert(banded.distinct == banded, "band replicas must not duplicate pairs")
    // boundary |Δt| == tol is included (l9–r19, l21–r31)
    assert(banded.contains(("l9", "r19")) && banded.contains(("l21", "r31")))
    // keys don't cross-match; s111 (Δt = 11s) is beyond tolerance
    assert(banded.filter(_._1 == "m100").map(_._2).toSet == Set("s110"))
  }

  test("randomized agreement with the naive theta join") {
    val rnd = new scala.util.Random(13)
    val ls = Seq.tabulate(250)(i => (rnd.nextInt(6).toLong, ts(rnd.nextInt(400).toLong), i.toLong))
      .toDF("user_id", "ts", "lid")
    val rs = Seq.tabulate(250)(i => (rnd.nextInt(6).toLong, ts(rnd.nextInt(400).toLong), i.toLong))
      .toDF("user_id", "ts", "rid")
    val banded = Relational.rangeJoin(ls,
        rs.select(col("user_id"), col("ts"), col("rid"), col("ts").as("rts")),
        "user_id", "ts", tolMs, rightCols = Seq("rid", "rts"))
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val naive = ls.as("l").join(rs.as("r"),
        col("l.user_id") === col("r.user_id") &&
          abs(unix_micros(col("l.ts")) - unix_micros(col("r.ts"))) <= tolMs * 1000)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(banded == naive)
    assert(banded.nonEmpty && banded.distinct == banded)
  }

  test("plans as an equi-join on (key, band), not a nested loop") {
    val plan = Relational.rangeJoin(left, rightSel, "user_id", "ts", tolMs,
      rightCols = Seq("rtag", "rts")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }
}
