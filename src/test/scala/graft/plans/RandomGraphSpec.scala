package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Event

/** Random well-formed StreamGraph generation — mirroring the reference's
  * `Arbitrary StreamVertex/StreamGraph` QuickCheck generators and
  * `graphEq`-modulo-renumbering (`StreamGraph.hs:149-324`). Properties:
  * every generated pipeline interprets without error; every default rule
  * application preserves well-formedness (source/sink reachability, DAG)
  * and sink semantics; `isoEq` identifies renumbered graphs. */
class RandomGraphSpec extends AnyFunSuite {

  private def pred(src: String)(f: Int => Boolean) =
    Param(src, (v: Any) => f(v.asInstanceOf[Int]))
  private def mapP(src: String)(f: Int => Int) =
    Param(src, (v: Any) => f(v.asInstanceOf[Int]): Any)

  // pool of well-typed Int→Int middle operators
  private val genMid: Gen[Int => StreamVertex] = Gen.oneOf[Int => StreamVertex](
    (id: Int) => StreamVertex(id, OpMap, List(mapP("(+7)")(_ + 7)), "Int", "Int", 1),
    (id: Int) => StreamVertex(id, OpMap, List(mapP("(*2)")(_ * 2)), "Int", "Int", 1),
    (id: Int) => StreamVertex(id, OpFilter(0.5), List(pred("(>10)")(_ > 10)), "Int", "Int", 1),
    (id: Int) => StreamVertex(id, OpFilter(0.5), List(pred("even")(_ % 2 == 0)), "Int", "Int", 1),
    (id: Int) => StreamVertex(id, OpScan, List(
      Param("sum", (acc: Any, v: Any) => (acc.asInstanceOf[Int] + v.asInstanceOf[Int]): Any),
      Param("0", 0: Any)), "Int", "Int", 1),
    (id: Int) => StreamVertex(id, OpFilterAcc(0.5), List(
      Param("keepLast", (acc: Any, v: Any) => v),
      Param("None", None: Any),
      Param("!=prev", (v: Any, acc: Any) => acc != (v: Any))), "Int", "Int", 1))

  private val genPipeline: Gen[StreamGraph] =
    for {
      n <- Gen.choose(0, 5)
      mids <- Gen.listOfN(n, genMid)
    } yield {
      val vs = StreamVertex(0, OpSource(1), Nil, "Int", "Int", 1) +:
        mids.zipWithIndex.map { case (mk, i) => mk(i + 1) } :+
        StreamVertex(n + 1, OpSink, Nil, "Int", "Int", 1)
      StreamGraph.path(vs)
    }

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def wellFormed(g: StreamGraph): Boolean = {
    val topo = g.topoOrder
    topo.length == g.vertices.length && // DAG, fully reachable ordering
      g.sources.nonEmpty && g.sinks.nonEmpty &&
      g.edges.forall { case (a, b) => g.byId.contains(a) && g.byId.contains(b) }
  }

  private val input: List[Event[Any]] =
    (1 to 30).map(i => Event.data(i * 10L, (i % 13): Any)).toList

  test("property: random pipelines interpret and rewrite soundly, staying well-formed") {
    samples(genPipeline, 40).foreach { g =>
      assert(wellFormed(g))
      val srcId = g.sources.head.id
      val expected = Interpreter.runToSinks(g, Map(srcId -> input))
      Rules.rewriteGraph(Rules.defaultRules, g, depth = 2).foreach { v =>
        assert(wellFormed(v.graph), s"ill-formed after ${v.sequence}:\n${v.graph.show}")
        assert(Interpreter.runToSinks(v.graph, Map(srcId -> input)) == expected,
          s"unsound ${v.sequence} on:\n${g.show}")
      }
    }
  }

  test("isoEq identifies graphs modulo vertex renumbering (reference graphEq)") {
    samples(genPipeline, 10).foreach { g =>
      val renumbered = StreamGraph(
        g.vertices.map(v => v.copy(id = v.id + 100)),
        g.edges.map { case (a, b) => (a + 100, b + 100) })
      assert(g.isoEq(renumbered))
      // a semantically different graph is not iso-equal
      if (g.vertices.length > 2) {
        val mutated = StreamGraph(
          g.vertices.map(v =>
            if (v.op == OpMap || v.op.isInstanceOf[OpFilter])
              v.copy(params = List(Param("different", (x: Any) => x)))
            else v),
          g.edges)
        if (mutated.vertices.exists(_.params.exists(_.src == "different")))
          assert(!g.isoEq(mutated))
      }
    }
  }
}
