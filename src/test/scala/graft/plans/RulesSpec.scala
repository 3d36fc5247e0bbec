package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Event
import graft.plans.Rules._

/** Rewrite-rule tests: structural checks mirroring the reference's
  * pre/post fixtures (`LogicalOptimiser.hs` test_*) plus SOUNDNESS checks
  * the reference lacks — every rule application must preserve the
  * interpreted sink output on sample streams. */
class RulesSpec extends AnyFunSuite {

  // -- param helpers (Int payloads routed through Any) --
  private def pred(src: String)(f: Int => Boolean) =
    Param(src, (v: Any) => f(v.asInstanceOf[Int]))
  private def mapP(src: String)(f: Int => Int) =
    Param(src, (v: Any) => f(v.asInstanceOf[Int]): Any)

  private def src(id: Int, t: String = "Int") = StreamVertex(id, OpSource(1), Nil, t, t, 1)
  private def sink(id: Int, t: String = "Int") = StreamVertex(id, OpSink, Nil, t, t, 1)

  private def ints(vs: Int*): Interpreter.S =
    vs.zipWithIndex.map { case (v, i) => Event.data(i * 10L, v: Any) }.toList
  private def lists(vs: List[Int]*): Interpreter.S =
    vs.zipWithIndex.map { case (v, i) => Event.data(i * 10L, v: Any) }.toList

  /** Apply rule; assert it fires; check all sinks produce identical output
    * before and after. */
  private def checkSound(rule: Rule, g: StreamGraph, inputs: Map[Int, Interpreter.S]): StreamGraph = {
    val g2 = rule(g).getOrElse(fail(s"rule did not fire on\n${g.show}"))
    val before = Interpreter.runToSinks(g, inputs).values.toList
    val after = Interpreter.runToSinks(g2, inputs).values.toList
    assert(after == before, s"rewrite changed semantics:\n${g.show}\n-->\n${g2.show}")
    g2
  }

  // changes-style filterAcc params: keep when != previous
  private val accF = Param("(\\_ v -> v)", (acc: Any, v: Any) => v)
  private val accInit = Param("None", None: Any)
  private val accP = Param("(v acc -> acc != Some(v))",
    (v: Any, acc: Any) => acc != (v: Any))

  test("filterFuse: selectivities multiply, rates combine (reference fixture)") {
    val g = StreamGraph.path(Seq(
      src(0),
      StreamVertex(1, OpFilter(0.5), List(pred("(>3)")(_ > 3)), "Int", "Int", 10),
      StreamVertex(2, OpFilter(0.5), List(pred("(<5)")(_ < 5)), "Int", "Int", 5),
      sink(3)))
    val g2 = checkSound(filterFuse, g, Map(0 -> ints(1, 4, 7, 4)))
    val f = g2.byId(1)
    assert(f.op == OpFilter(0.25))
    assert(f.serviceRate == sumRates(10, 0.5, 5))
    assert(g2.vertices.length == 3 && g2.edges.toSet == Set((0, 1), (1, 3)))
  }

  test("sumRates matches reference examples") {
    assert(sumRates(1, 1, 1) == 0.5)
    assert(sumRates(5, 0.5, 10) == 4.0)
  }

  test("mapFilter pushes predicate through projection") {
    val g = StreamGraph.path(Seq(
      src(0),
      StreamVertex(1, OpMap, List(mapP("(+1)")(_ + 1)), "Int", "Int", 1),
      StreamVertex(2, OpFilter(0.5), List(pred("(>3)")(_ > 3)), "Int", "Int", 1),
      sink(3)))
    val g2 = checkSound(mapFilter, g, Map(0 -> ints(1, 2, 3, 4)))
    assert(g2.byId(1).op.isInstanceOf[OpFilter] && g2.byId(2).op == OpMap)
  }

  test("filterFilterAcc fuses with guarded acc update") {
    val g = StreamGraph.path(Seq(
      src(0),
      StreamVertex(1, OpFilter(0.5), List(pred("(>1)")(_ > 1)), "Int", "Int", 10),
      StreamVertex(2, OpFilterAcc(0.5), List(accF, accInit, accP), "Int", "Int", 5),
      sink(3)))
    val g2 = checkSound(filterFilterAcc, g, Map(0 -> ints(1, 2, 2, 3, 3, 1, 3)))
    assert(g2.byId(1).op == OpFilterAcc(0.25))
  }

  test("filterAccFilter fuses with conjoined predicate") {
    val g = StreamGraph.path(Seq(
      src(0),
      StreamVertex(1, OpFilterAcc(0.5), List(accF, accInit, accP), "Int", "Int", 10),
      StreamVertex(2, OpFilter(0.5), List(pred("(>1)")(_ > 1)), "Int", "Int", 5),
      sink(3)))
    checkSound(filterAccFilter, g, Map(0 -> ints(1, 2, 2, 3, 1, 1, 3)))
  }

  test("filterAccFilterAcc pairs accumulators") {
    val count3 = List(
      Param("cnt+1", (acc: Any, v: Any) => (acc.asInstanceOf[Int] + 1): Any),
      Param("0", 0: Any),
      Param("(v, cnt) => cnt % 2 == 0", (v: Any, acc: Any) => acc.asInstanceOf[Int] % 2 == 0))
    val g = StreamGraph.path(Seq(
      src(0),
      StreamVertex(1, OpFilterAcc(0.5), List(accF, accInit, accP), "Int", "Int", 10),
      StreamVertex(2, OpFilterAcc(0.5), count3, "Int", "Int", 5),
      sink(3)))
    checkSound(filterAccFilterAcc, g, Map(0 -> ints(1, 2, 2, 3, 1, 1, 3, 4)))
  }

  test("mapFuse composes projections") {
    val g = StreamGraph.path(Seq(
      src(0),
      StreamVertex(1, OpMap, List(mapP("(+1)")(_ + 1)), "Int", "Int", 1),
      StreamVertex(2, OpMap, List(mapP("(*2)")(_ * 2)), "Int", "Int", 1),
      sink(3)))
    val g2 = checkSound(mapFuse, g, Map(0 -> ints(1, 2, 3)))
    assert(g2.byId(1).serviceRate == 0.5) // reference mapFusePost
  }

  test("mapScan fuses projection into fold") {
    val g = StreamGraph.path(Seq(
      src(0),
      StreamVertex(1, OpMap, List(mapP("(+1)")(_ + 1)), "Int", "Int", 1),
      StreamVertex(2, OpScan, List(
        Param("sum", (acc: Any, v: Any) => (acc.asInstanceOf[Int] + v.asInstanceOf[Int]): Any),
        Param("0", 0: Any)), "Int", "Int", 1),
      sink(3)))
    checkSound(mapScan, g, Map(0 -> ints(1, 2, 3)))
  }

  test("expandFilter pushes filter inside arrays") {
    val g = StreamGraph.path(Seq(
      src(0, "[Int]"),
      StreamVertex(1, OpExpand, Nil, "[Int]", "Int", 2),
      StreamVertex(2, OpFilter(0.5), List(pred("(>3)")(_ > 3)), "Int", "Int", 3),
      sink(3)))
    val g2 = checkSound(expandFilter, g, Map(0 -> lists(List(1, 4), List(7), Nil)))
    assert(g2.byId(1).op == OpMap && g2.byId(2).op == OpExpand)
  }

  test("mapFilterAcc swaps map after stateful filter (value-insensitive acc)") {
    // The rule is only sound when the accumulator update doesn't depend on
    // whether values were mapped (see Rules.mapFilterAcc caveat) — use a
    // counting accumulator (1-in-2 sampler).
    val sampler = List(
      Param("cnt+1", (acc: Any, v: Any) => (acc.asInstanceOf[Int] + 1): Any),
      Param("0", 0: Any),
      Param("cnt%2==0", (v: Any, acc: Any) => acc.asInstanceOf[Int] % 2 == 0))
    val g = StreamGraph.path(Seq(
      src(0),
      StreamVertex(1, OpMap, List(mapP("(*2)")(_ * 2)), "Int", "Int", 1),
      StreamVertex(2, OpFilterAcc(0.5), sampler, "Int", "Int", 1),
      sink(3)))
    val g2 = checkSound(mapFilterAcc, g, Map(0 -> ints(1, 1, 2, 2, 1)))
    assert(g2.byId(1).op.isInstanceOf[OpFilterAcc] && g2.byId(2).op == OpMap)
  }

  test("mapWindow swaps map after window (type-compatible)") {
    val wm = Param("chop 2",
      (s: List[Event[Any]]) => graft.core.WindowMakers.chop[Any](2)(s))
    val g = StreamGraph.path(Seq(
      src(0),
      StreamVertex(1, OpMap, List(mapP("(+1)")(_ + 1)), "Int", "Int", 2),
      StreamVertex(2, OpWindow, List(wm), "Int", "[Int]", 3),
      sink(3, "[Int]")))
    val g2 = checkSound(mapWindow, g, Map(0 -> ints(1, 2, 3, 4, 5)))
    assert(g2.byId(1).op == OpWindow && g2.byId(2).op == OpMap)
  }

  test("mapWindow does not fire on incompatible types") {
    val wm = Param("chop 2", (s: List[Event[Any]]) => graft.core.WindowMakers.chop[Any](2)(s))
    val g = StreamGraph.path(Seq(
      src(0, "String"),
      StreamVertex(1, OpMap, List(mapP("read")(identity)), "String", "Int", 2),
      StreamVertex(2, OpWindow, List(wm), "Int", "[Int]", 3),
      sink(3, "[Int]")))
    assert(mapWindow(g).isEmpty)
  }

  test("expandMap swaps to map-over-list before expand") {
    val g = StreamGraph.path(Seq(
      src(0, "[Int]"),
      StreamVertex(1, OpExpand, Nil, "[Int]", "Int", 2),
      StreamVertex(2, OpMap, List(mapP("(+10)")(_ + 10)), "Int", "Int", 3),
      sink(3)))
    val g2 = checkSound(expandMap, g, Map(0 -> lists(List(1, 2), List(3))))
    assert(g2.byId(1).op == OpMap && g2.byId(2).op == OpExpand)
    assert(g2.byId(1).outType == "[Int]")
  }

  test("expandScan re-expresses scan over lists") {
    val g = StreamGraph.path(Seq(
      src(0, "[Int]"),
      StreamVertex(1, OpExpand, Nil, "[Int]", "Int", 2),
      StreamVertex(2, OpScan, List(
        Param("sum", (acc: Any, v: Any) => (acc.asInstanceOf[Int] + v.asInstanceOf[Int]): Any),
        Param("0", 0: Any)), "Int", "Int", 3),
      sink(3)))
    val g2 = checkSound(expandScan, g, Map(0 -> lists(List(1, 2), Nil, List(3))))
    assert(g2.byId(1).op == OpFilter(0.5))
  }

  test("expandExpand collapses to concat") {
    val g = StreamGraph.path(Seq(
      src(0, "[[Int]]"),
      StreamVertex(1, OpExpand, Nil, "[[Int]]", "[Int]", 2),
      StreamVertex(2, OpExpand, Nil, "[Int]", "Int", 3),
      sink(3)))
    val g2 = checkSound(expandExpand, g,
      Map(0 -> List(Event.data(0L, List(List(1, 2), List(3)): Any))))
    assert(g2.byId(1).op == OpMap)
  }

  test("expandFilterAcc re-expresses stateful filter over lists") {
    val g = StreamGraph.path(Seq(
      src(0, "[Int]"),
      StreamVertex(1, OpExpand, Nil, "[Int]", "Int", 1),
      StreamVertex(2, OpFilterAcc(0.5), List(accF, accInit, accP), "Int", "Int", 2),
      sink(3)))
    val g2 = checkSound(expandFilterAcc, g,
      Map(0 -> lists(List(1, 1, 2), List(2, 3), List(3))))
    assert(g2.byId(1).op == OpScan)
  }

  test("mergeFilter hoists a filter upstream through merge") {
    val m = StreamVertex(2, OpMerge, Nil, "Int", "Int", 3)
    val f = StreamVertex(3, OpFilter(0.5), List(pred("(>3)")(_ > 3)), "Int", "Int", 4)
    val g = StreamGraph.path(Seq(src(0), m, f, sink(4)))
      .overlay(StreamGraph.path(Seq(src(1), m)))
    val g2 = checkSound(mergeFilter, g,
      Map(0 -> ints(1, 5, 7), 1 -> List(Event.data(5L, 4: Any), Event.data(15L, 2: Any))))
    // one new filter per inbound branch, none downstream of merge
    assert(g2.vertices.count(_.op.isInstanceOf[OpFilter]) == 2)
    assert(g2.successors(2) == Vector(4))
  }

  test("filterMerge pushes identical filters below merge") {
    val m = StreamVertex(2, OpMerge, Nil, "Int", "Int", 3)
    val fa = StreamVertex(3, OpFilter(0.5), List(pred("(>3)")(_ > 3)), "Int", "Int", 4)
    val fb = StreamVertex(5, OpFilter(0.5), List(pred("(>3)")(_ > 3)), "Int", "Int", 4)
    val g = StreamGraph.path(Seq(src(0), fa, m, sink(4)))
      .overlay(StreamGraph.path(Seq(src(1), fb, m)))
    val g2 = checkSound(filterMerge, g,
      Map(0 -> ints(1, 5, 7), 1 -> List(Event.data(5L, 4: Any), Event.data(15L, 2: Any))))
    assert(g2.vertices.count(_.op.isInstanceOf[OpFilter]) == 1)
  }

  test("mergeMap hoists and mapMerge pushes back (round trip preserves semantics)") {
    val m = StreamVertex(2, OpMerge, Nil, "Int", "Int", 3)
    val mp = StreamVertex(3, OpMap, List(mapP("(*3)")(_ * 3)), "Int", "String", 4)
    val g = StreamGraph.path(Seq(src(0), m, mp, sink(4)))
      .overlay(StreamGraph.path(Seq(src(1), m)))
    val inputs = Map(0 -> ints(1, 5), 1 -> List(Event.data(5L, 4: Any)))
    val hoisted = checkSound(mergeMap, g, inputs)
    checkSound(mapMerge, hoisted, inputs)
  }

  test("mergeFuse flattens nested merges") {
    val m1 = StreamVertex(3, OpMerge, Nil, "Int", "Int", 4)
    val m2 = StreamVertex(4, OpMerge, Nil, "Int", "Int", 5)
    val g = StreamGraph.path(Seq(src(0), m1, m2, sink(5)))
      .overlay(StreamGraph.path(Seq(src(1), m1)))
      .overlay(StreamGraph.path(Seq(src(2), m2)))
    val g2 = checkSound(mergeFuse, g, Map(
      0 -> ints(1), 1 -> List(Event.data(5L, 2: Any)), 2 -> List(Event.data(7L, 3: Any))))
    assert(g2.vertices.count(_.op == OpMerge) == 1)
  }

  test("variant enumeration carries provenance and dedupes") {
    val g = StreamGraph.path(Seq(
      src(0),
      StreamVertex(1, OpMap, List(mapP("(+1)")(_ + 1)), "Int", "Int", 5),
      StreamVertex(2, OpFilter(0.5), List(pred("(>3)")(_ > 3)), "Int", "Int", 10),
      StreamVertex(3, OpFilter(0.5), List(pred("(<9)")(_ < 9)), "Int", "Int", 5),
      sink(4)))
    val variants = rewriteGraph(defaultRules, g, depth = 3)
    assert(variants.exists(_.sequence == List("mapFilter")))
    // fuse the filters, then push the fused predicate through the map
    assert(variants.exists(_.sequence == List("filterFuse", "mapFilter")))
    // every variant is sound
    val in = Map(0 -> ints(1, 4, 8, 10))
    val expected = Interpreter.runToSinks(g, in)
    variants.foreach { v =>
      assert(Interpreter.runToSinks(v.graph, in).values.toList == expected.values.toList,
        s"unsound variant ${v.sequence}")
    }
  }
}
