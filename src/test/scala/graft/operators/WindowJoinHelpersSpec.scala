package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{Event, WindowMakers}
import graft.core.StreamOps._

/** The library windowed-join helpers ([[Relational.windowedThetaJoin]],
  * [[Relational.windowPairJoin]]) must agree with the typed exact-parity
  * surface (`streamJoinE`/`streamJoinW`) on a replayed list where the two
  * formulations' window semantics coincide: first events on an exact hour
  * boundary and every hour populated on both sides, so the typed surface's
  * first-event-aligned chopTime windows equal the relational hour buckets
  * and zip-by-position equals join-by-window-key. */
class WindowJoinHelpersSpec extends SparkSuite {
  import spark.implicits._

  private val HourMs = 3600L * 1000
  private val T0 = 1700000000000L - (1700000000000L % HourMs) // exact hour boundary

  // two streams over 3 hours, both sides present in every hour
  private val left: Seq[Event[(Int, Double)]] = for {
    h <- 0 until 3; i <- 0 until 4
  } yield Event.data(T0 - 1700000000000L + h * HourMs + i * 60000L, (i % 2, (h * 10 + i).toDouble))
  private val right: Seq[Event[(Int, Double)]] = for {
    h <- 0 until 3; i <- 0 until 3
  } yield Event.data(T0 - 1700000000000L + h * HourMs + i * 90000L, (i % 2, (h * 5 + i).toDouble))

  // Event.data offsets are relative to the spec epoch: rebuild with absolute ts
  private def abs(evs: Seq[Event[(Int, Double)]]): Seq[Event[(Int, Double)]] =
    evs.map(e => Event(e.time.map(t =>
      new java.sql.Timestamp(T0 + (t.getTime - 1700000000000L))), e.value))

  private def toDf(evs: Seq[Event[(Int, Double)]], keyName: String, valName: String) =
    evs.map(e => (new java.sql.Timestamp(e.time.get.getTime), e.value.get._1, e.value.get._2))
      .toDF("ts", keyName, valName)

  test("windowedThetaJoin agrees with typed streamJoinE on aligned hourly windows") {
    val l = abs(left)
    val r = abs(right)
    // typed: chopTime(hour) windows zipped pairwise, theta = same key && lv > rv
    val typed = l.toDS.streamJoinE(
        WindowMakers.chopTime[(Int, Double)](HourMs), WindowMakers.chopTime[(Int, Double)](HourMs))(
        (a, b) => a._1 == b._1 && a._2 > b._2)((a, b) => (a._1, a._2, b._2))(r.toDS)
      .collect().flatMap(_.value).toSet
    val rel = Relational.windowedThetaJoin(
        toDf(l, "k", "lv"), toDf(r, "rk", "rv").withColumnRenamed("ts", "r_ts"),
        date_trunc("hour", col("ts")), date_trunc("hour", col("r_ts")),
        equi = Seq(col("k") -> col("rk")), theta = col("lv") > col("rv"))
      .select(col("k"), col("lv"), col("rv"))
      .collect().map(row => (row.getInt(0), row.getDouble(1), row.getDouble(2))).toSet
    assert(typed.nonEmpty && typed == rel,
      s"typed=${typed.size} rel=${rel.size}; diff=${(typed diff rel) ++ (rel diff typed)}")
  }

  test("windowPairJoin agrees with typed streamJoinW on aligned hourly windows") {
    val l = abs(left)
    val r = abs(right)
    val typed = l.toDS.streamJoinW(
        WindowMakers.chopTime[(Int, Double)](HourMs), WindowMakers.chopTime[(Int, Double)](HourMs))(
        (w1, w2) => (w1.map(_._2).sum, w2.length))(r.toDS)
      .collect().flatMap(_.value).toSet
    val rel = Relational.windowPairJoin(
        toDf(l, "k", "lv"), toDf(r, "rk", "rv").withColumnRenamed("ts", "r_ts"),
        date_trunc("hour", col("ts")), date_trunc("hour", col("r_ts")),
        leftAggs = Seq(sum(col("lv")).as("lsum")), rightAggs = Seq(count(lit(1)).as("rn")))
      .select(col("lsum"), col("rn"))
      .collect().map(row => (row.getDouble(0), row.getLong(1).toInt)).toSet
    assert(typed.nonEmpty && typed == rel,
      s"typed=$typed rel=$rel")
  }

  test("windowedThetaJoin plans a hash join on (window, equi keys), not a cartesian") {
    val l = abs(left)
    val r = abs(right)
    val plan = Relational.windowedThetaJoin(
        toDf(l, "k", "lv"), toDf(r, "rk", "rv").withColumnRenamed("ts", "r_ts"),
        date_trunc("hour", col("ts")), date_trunc("hour", col("r_ts")),
        equi = Seq(col("k") -> col("rk")), theta = col("lv") > col("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"theta predicate leaked into the join strategy:\n$plan")
  }
}
