package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Dot-export shape tests (reference `VizGraph.hs` has 9 analogous ones). */
class VizGraphSpec extends AnyFunSuite {

  private val g = StreamGraph.path(Seq(
    StreamVertex(1, OpSource(1.2), List(Param("src", () => 0)), "Int", "Int", 1000),
    StreamVertex(2, OpFilter(0.5), List(Param("(>5)", (v: Any) => true)), "Int", "Int", 2000),
    StreamVertex(3, OpSink, Nil, "Int", "Int", 1000)))

  test("streamGraphToDot: digraph with labelled box vertices and weighted edges") {
    val dot = VizGraph.streamGraphToDot(g)
    assert(dot.startsWith("digraph {"))
    assert(dot.contains("""1 [label="Source src""""))
    assert(dot.contains("""2 [label="Filter (>5)""""))
    assert(dot.contains("""3 [label="Sink""""))
    assert(dot.contains("1 -> 2"))
    assert(dot.contains("2 -> 3"))
    assert(dot.trim.endsWith("}"))
  }

  test("quotes and backslashes in param sources are escaped") {
    val weird = StreamGraph.path(Seq(
      StreamVertex(1, OpSource(1), Nil, "S", "S", 1),
      StreamVertex(2, OpMap, List(Param("""s.replace("\\", "/")""", (v: Any) => v)), "S", "S", 1),
      StreamVertex(3, OpSink, Nil, "S", "S", 1)))
    val dot = VizGraph.streamGraphToDot(weird)
    assert(dot.contains("""\"\\\\\""""))
  }

  test("partitionedGraphToDot: one dashed cluster per partition labelled Node N") {
    val dot = VizGraph.partitionedGraphToDot(g, List(List(1, 2), List(3)))
    assert(dot.contains("subgraph cluster1"))
    assert(dot.contains("subgraph cluster2"))
    assert(dot.contains("""label="Node 1""""))
    assert(dot.contains("""style="rounded,dashed""""))
    assert(dot.contains("1,2"))
  }

  test("jacksonGraphToDot annotates vertices with arrival rate and utilisation") {
    val dot = VizGraph.jacksonGraphToDot(g)
    assert(dot.contains("λ="))
    assert(dot.contains("ρ="))
    // source arrival rate flows from the Source annotation
    assert(dot.contains("λ=1.200") || dot.contains("λ=1,200"))
  }
}
