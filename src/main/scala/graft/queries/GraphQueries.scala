package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Event
import graft.plans._

/** End-to-end StreamGraph execution through the driver contract: author a
  * graph in the IR (source → map → filter → scan → sink), lower it with
  * [[graft.plans.Lowering]], and check the result against a plain SQL
  * oracle — proving the IR path (authoring → rewriting → lowering) computes
  * the same answers as the relational formulations. */
object GraphQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_lowered" -> ((s, dir) => {
      import s.implicits._
      // DISTRIBUTED source (no orderBy, no coalesce(1)): the scan declares
      // its fold a monoid (sum, 0, +), so Lowering runs the distributed
      // prefix-scan — range-partitioned by stream order, per-partition
      // folds, a numPartitions-sized driver combine — instead of the
      // single-ordered-partition interpreter-parity path (that path stays
      // spec-covered in LoweringSpec). Event times are unique in `events`,
      // so the fold order is well-defined without a tiebreak.
      val src = Tables.events(s, dir)
        .select(col("ts"), col("value"))
        .as[(java.sql.Timestamp, Double)]
        .map { case (ts, v) => Event(Some(ts), Some(v: Any)) }(Encoders.kryo[Event[Any]])
      val g = StreamGraph.path(Seq(
        StreamVertex(0, OpSource(1), Nil, "Double", "Double", 1),
        StreamVertex(1, OpMap,
          List(Param("(*2)", (v: Any) => (v.asInstanceOf[Double] * 2): Any)),
          "Double", "Double", 1),
        StreamVertex(2, OpFilter(0.5),
          List(Param("(>20)", (v: Any) => v.asInstanceOf[Double] > 20.0)),
          "Double", "Double", 1),
        StreamVertex(3, OpScan, List(
          Param("sum", (acc: Any, v: Any) =>
            (acc.asInstanceOf[Double] + v.asInstanceOf[Double]): Any),
          Param("0.0", 0.0: Any),
          Param("(+)", (a: Any, b: Any) =>
            (a.asInstanceOf[Double] + b.asInstanceOf[Double]): Any)),
          "Double", "Double", 1),
        StreamVertex(4, OpSink, Nil, "Double", "Double", 1)))
      Lowering.lower(s, g, Map(0 -> src))(4)
        .map { e =>
          val x = e.value.get.asInstanceOf[Double]
          (e.time.get, math.floor(x * 100 + 0.5) / 100)
        }
        .toDF("ts", "running")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_graph_lowered" ->
      """WITH f AS (
        |  SELECT ts, event_id, value * 2 AS v FROM events WHERE value * 2 > 20.0)
        |SELECT ts,
        |       floor(sum(v) OVER (ORDER BY ts, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             * 100 + 0.5) / 100 AS running
        |FROM f""".stripMargin
  )
}
