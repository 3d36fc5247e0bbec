package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Event

/** Jackson + Bandwidth + Planner tests mirroring the reference's fixtures:
  * the taxi Q1 arrival-rate solution (`Jackson.hs:204-205`), departure-rate
  * cases (`Bandwidth.hs:128-136`), and the 3-vertex partition enumeration
  * (`Partition.hs:128-148`). */
class CostModelSpec extends AnyFunSuite {

  private val noP = List.empty[Param]

  /** Taxi Q1 pipeline with the reference's annotations
    * (`Jackson.hs:171-205`): source 1.2 ev/s, filter sel 0.95, dedup
    * filterAcc sel 0.1, service rates [0,10000,10000,10000,10,10000,10000]. */
  private val taxiQ1 = StreamGraph.path(Seq(
    StreamVertex(1, OpSource(1.2), noP, "Trip", "Trip", 0),
    StreamVertex(2, OpMap, noP, "Trip", "Journey", 10000),
    StreamVertex(3, OpFilter(0.95), noP, "Journey", "Journey", 10000),
    StreamVertex(4, OpWindow, noP, "Journey", "[Journey]", 10000),
    StreamVertex(5, OpMap, noP, "[Journey]", "Q1Output", 10),
    StreamVertex(6, OpFilterAcc(0.1), noP, "Q1Output", "Q1Output", 10000),
    StreamVertex(7, OpSink, noP, "Q1Output", "Q1Output", 10000)))

  test("taxi Q1 arrival rates match the reference's solved fixture") {
    val ois = Jackson.calcAll(taxiQ1)
    val expected = List(1.2, 1.2, 1.2, 1.14, 1.14, 1.14, 0.114)
    val got = ois.sortBy(_.opId).map(_.arrRate)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $got expected $expected")
    }
  }

  test("taxi Q1 is not over-utilised; map@10ev/s is the bottleneck") {
    val ois = Jackson.calcAll(taxiQ1)
    assert(!Jackson.isOverUtilised(ois))
    val bottleneck = ois.maxBy(_.util)
    assert(bottleneck.opId == 5)
    assert(math.abs(bottleneck.util - 1.14 / 10) < 1e-9)
  }

  test("over-utilisation detected (reference test_isOverUtilised)") {
    val g = StreamGraph.path(Seq(
      StreamVertex(0, OpSource(8), noP, "Int", "Int", 0),
      StreamVertex(4, OpMerge, noP, "Int", "Int", 0.2),
      StreamVertex(1, OpFilter(0.5), noP, "Int", "Int", 0),
      StreamVertex(5, OpSink, noP, "Int", "Int", 0)))
    assert(Jackson.isOverUtilised(Jackson.calcAll(g)))
  }

  test("outputRate: filters attenuate, join takes min input") {
    val g = StreamGraph(Vector(
      StreamVertex(1, OpSource(1), noP, "Int", "Int", 0),
      StreamVertex(2, OpSource(1), noP, "Int", "Int", 0),
      StreamVertex(3, OpMerge, noP, "Int", "Int", 0),
      StreamVertex(4, OpSource(3), noP, "Int", "Int", 0),
      StreamVertex(5, OpJoin, noP, "Int", "(Int,Int)", 0),
      StreamVertex(6, OpFilter(0.5), noP, "(Int,Int)", "(Int,Int)", 0),
      StreamVertex(7, OpSink, noP, "(Int,Int)", "IO", 0)),
      Vector((1, 3), (2, 3), (3, 5), (4, 5), (5, 6), (6, 7)))
    assert(Jackson.outputRate(g, 1) == 1.0)
    assert(Jackson.outputRate(g, 3) == 2.0)
    assert(Jackson.outputRate(g, 5) == 2.0) // min(merge=2, src=3)
  }

  // -- bandwidth -------------------------------------------------------------

  private val bwGraph = {
    val v1 = StreamVertex(1, OpSource(2), noP, "Int", "Int", 0)
    val v2 = StreamVertex(2, OpMap, List(Param("id", (x: Any) => x)), "Int", "Int", 1)
    val v3 = StreamVertex(3, OpSource(1), noP, "Int", "Int", 2)
    val v4 = StreamVertex(4, OpMap, List(Param("id", (x: Any) => x)), "Int", "Int", 3)
    val v5 = StreamVertex(5, OpMerge, noP, "Int", "Int", 4)
    val v6 = StreamVertex(6, OpSink, noP, "Int", "IO", 5)
    StreamGraph.path(Seq(v3, v4, v5)).overlay(StreamGraph.path(Seq(v1, v2, v5, v6)))
  }

  test("departRate: merge sums inputs (reference test_departRate_merge)") {
    assert(Bandwidth.departRate(bwGraph, 6) == 3.0)
  }

  test("departRate: join takes min, filter attenuates, chopTime emits 1/period") {
    val v7 = StreamVertex(7, OpFilter(0.5), noP, "Int", "Int", 7)
    val v8 = StreamVertex(8, OpJoin, noP, "Int", "(Int,Int)", 8)
    val g2 = {
      val v1 = bwGraph.byId(1); val v2 = bwGraph.byId(2)
      val v3 = bwGraph.byId(3); val v4 = bwGraph.byId(4); val v6 = bwGraph.byId(6)
      StreamGraph.path(Seq(v3, v4, v8)).overlay(StreamGraph.path(Seq(v1, v2, v8, v7, v6)))
    }
    assert(Bandwidth.departRate(g2, 8) == 1.0)
    assert(Bandwidth.departRate(g2, 7) == 0.5)

    val wv = StreamVertex(9, OpWindow,
      List(Param("chopTime 120", (s: List[Event[Any]]) => graft.core.WindowMakers.chopTime[Any](120)(s))),
      "a", "[a]", 9)
    val g3 = StreamGraph.path(Seq(bwGraph.byId(1), bwGraph.byId(2), wv, v7, bwGraph.byId(6)))
    assert(math.abs(Bandwidth.departRate(g3, 9) - 1 / 0.12) < 1e-9)
  }

  test("bandwidth: egress = rate × size + 60B/event overhead") {
    // vertex 2 (Map Int): departs at 2 ev/s, Int event = 18 B → 36 B/s raw
    assert(Bandwidth.whatBandwidth(bwGraph, 2).contains(36.0))
    assert(Bandwidth.whatBandwidthWeighted(bwGraph, 2).contains(36.0 + 2 * 60.0))
  }

  // -- partitions ------------------------------------------------------------

  test("allPartitions on source→map→sink matches the reference enumeration") {
    val g = StreamGraph.path(Seq(
      StreamVertex(0, OpSource(1), noP, "", "", 0),
      StreamVertex(1, OpMap, List(Param("id", (x: Any) => x)), "", "", 1),
      StreamVertex(2, OpSink, noP, "", "", 2)))
    val ps = Planner.allPartitions(g).toSet
    assert(ps == Set(
      List(List(2), List(1), List(0)),
      List(List(2), List(1, 0)),
      List(List(2, 1), List(0))))
  }

  test("planCost rejects over-utilised plans, else counts partitions") {
    val opts = Planner.PlanOpts()
    val plan = Planner.Plan(taxiQ1, List(List(1, 2, 3), List(4, 5, 6, 7)))
    assert(Planner.planCost(opts, plan).contains(2))

    val hot = taxiQ1.replaceVertex(taxiQ1.byId(5), taxiQ1.byId(5).copy(serviceRate = 1.0))
    val bad = Planner.Plan(hot, List(List(1, 2, 3), List(4, 5, 6, 7)))
    assert(Planner.planCost(opts, bad).isEmpty) // util 1.14 > 1 at vertex 5
  }

  test("bestPlan finds a minimal viable partitioning") {
    val g = StreamGraph.path(Seq(
      StreamVertex(0, OpSource(1), noP, "Int", "Int", 0),
      StreamVertex(1, OpMap, List(Param("id", (x: Any) => x)), "Int", "Int", 100),
      StreamVertex(2, OpSink, noP, "Int", "Int", 100)))
    // bandwidth limit high enough that a 2-partition plan is viable
    val opts = Planner.PlanOpts(maxBandwidth = 1e6, rewriteDepth = 1)
    val best = Planner.bestPlan(opts, g)
    assert(best.nonEmpty)
    assert(best.get.partitions.length == 2) // can't go below (source+sink split)
  }
}
