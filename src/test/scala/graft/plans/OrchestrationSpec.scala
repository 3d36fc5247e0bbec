package graft.plans

import graft.SparkSuite
import graft.core.Event

/** End-to-end orchestration (the reference's `distributeProgram` flow,
  * `Orchestration.hs:59-66`): author a graph → enumerate rewrite variants →
  * cost with Jackson/bandwidth → pick the best viable plan → execute the
  * chosen graph on Spark — and get the same answer as the original. */
class OrchestrationSpec extends SparkSuite {

  test("author -> rewrite -> cost -> select -> lower end-to-end") {
    val g = StreamGraph.path(Seq(
      StreamVertex(0, OpSource(2), Nil, "Int", "Int", 0),
      StreamVertex(1, OpMap,
        List(Param("(*3)", (v: Any) => (v.asInstanceOf[Int] * 3): Any)), "Int", "Int", 1000),
      StreamVertex(2, OpFilter(0.5),
        List(Param("(>6)", (v: Any) => v.asInstanceOf[Int] > 6)), "Int", "Int", 1000),
      StreamVertex(3, OpFilter(0.8),
        List(Param("(<40)", (v: Any) => v.asInstanceOf[Int] < 40)), "Int", "Int", 1000),
      StreamVertex(4, OpSink, Nil, "Int", "Int", 1000)))

    val opts = Planner.PlanOpts(maxBandwidth = 1e9, rewriteDepth = 2)
    val best = Planner.bestPlan(opts, g).getOrElse(fail("no viable plan"))
    // the fused-filter variants admit smaller partitionings; the chosen
    // plan must be viable and minimal
    assert(Planner.planCost(opts, best).nonEmpty)

    val input = (1 to 20).map(i => Event.data(i * 10L, i: Any)).toList
    val expected = Interpreter.runToSinks(g, Map(0 -> input)).values.head
    val got = Lowering.runToSinks(spark, best.graph, Map(0 -> input)).values.head
    assert(got == expected, s"selected plan ${best.partitions} diverged")
  }
}
