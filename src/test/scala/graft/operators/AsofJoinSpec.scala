package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `Relational.asofJoin` — most-recent-at-or-before enrichment, join-free
  * (union + keyed running window; see the operator's scaladoc). */
class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  private val left = Seq(
    (1L, ts(5), "l_a"),   // before any right event → null payload
    (1L, ts(10), "l_b"),  // equal-ts right event matches (at-or-before)
    (1L, ts(25), "l_c"),  // latest prior right wins, not the first
    (2L, ts(50), "l_d"),  // equal-ts match on another key
    (3L, ts(15), "l_e"))  // two rights tie on (key, ts) → rightOrder breaks
    .toDF("user_id", "ts", "tag")

  private val right = Seq(
    (1L, ts(10), 100L),
    (1L, ts(20), 200L),
    (2L, ts(50), 300L),
    (3L, ts(10), 400L),
    (3L, ts(10), 401L))
    .toDF("user_id", "ts", "rid")

  private lazy val joined = Relational.asofJoin(
      left, right, key = "user_id", ts = "ts",
      rightCols = Seq("rid"), rightOrder = Some("rid"))
    .select(col("tag"), col("rid"))
    .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
    .toMap

  test("picks the most recent at-or-before right row per key") {
    assert(joined("l_a") == -1L) // left-outer: no prior right → null
    assert(joined("l_b") == 100L) // same-instant right included
    assert(joined("l_c") == 200L)
    assert(joined("l_d") == 300L)
  }

  test("rightOrder breaks (key, ts) ties among right rows deterministically") {
    assert(joined("l_e") == 401L)
  }

  test("randomized agreement with the naive per-left-row argmax formulation") {
    val rnd = new scala.util.Random(7)
    val ls = Seq.tabulate(300)(i => (rnd.nextInt(8).toLong, ts(rnd.nextInt(500).toLong), i.toLong))
      .toDF("user_id", "ts", "lid")
    val rs = Seq.tabulate(300)(i => (rnd.nextInt(8).toLong, ts(rnd.nextInt(500).toLong), i.toLong))
      .toDF("user_id", "ts", "rid")
    val viaAsof = Relational.asofJoin(ls, rs, "user_id", "ts",
        rightCols = Seq("rid"), rightOrder = Some("rid"))
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // naive: theta-join all at-or-before rights, keep the (ts, rid)-max one
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lid")).orderBy(col("rts").desc, col("rid").desc)
    val naive = ls.join(
        rs.select(col("user_id").as("ruk"), col("ts").as("rts"), col("rid")),
        col("user_id") === col("ruk") && col("rts") <= col("ts"))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val matched = viaAsof.filter(_._2 >= 0)
    assert(matched == naive)
    assert(matched.nonEmpty && matched.size < viaAsof.size) // both cases exercised
  }

  test("plan is join-free: one keyed window over the union, no join operator") {
    val plan = Relational.asofJoin(left, right, "user_id", "ts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected a join-free plan, got:\n$plan")
    assert(plan.contains("Window"))
    // exactly one exchange: the hash partitioning by key for the window
    assert("Exchange".r.findAllIn(plan).size == 1, s"expected 1 exchange:\n$plan")
  }
}
