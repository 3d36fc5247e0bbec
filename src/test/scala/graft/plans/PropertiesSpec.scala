package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Event, WindowMakers}

/** Property tests mirroring the reference's QuickCheck properties
  * (`FunctionalProcessing.hs:193-203` — e.g. scan preserves length) plus
  * rewrite soundness on RANDOM finite streams with value-less (time-tick)
  * events — a property suite the reference lacks. Deterministic seeded
  * sampling (no scalatestplus bridge needed offline). */
class PropertiesSpec extends AnyFunSuite {

  // random streams: strictly increasing timestamps, ~10% time-ticks
  private val genStream: Gen[List[Event[Any]]] =
    for {
      n <- Gen.choose(0, 40)
      vals <- Gen.listOfN(n, Gen.choose(-50, 50))
      ticks <- Gen.listOfN(n, Gen.frequency(9 -> false, 1 -> true))
    } yield vals.zip(ticks).zipWithIndex.map { case ((v, isTick), i) =>
      if (isTick) Event.tick[Any](i * 10L) else Event.data(i * 10L, v: Any)
    }

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val streams = samples(genStream, 60)

  test("property: streamScan preserves stream length (reference prop_streamScan_samelength)") {
    streams.foreach { s =>
      assert(Interpreter.streamScan((acc, v) => v, 0: Any)(s).length == s.length)
    }
  }

  test("property: streamFilter(const true) is identity; filter output is an ordered subsequence") {
    streams.foreach { s =>
      assert(Interpreter.streamFilter(_ => true)(s) == s)
      val out = Interpreter.streamFilter(_.asInstanceOf[Int] > 0)(s)
      assert(out.forall(s.contains))
      val idxs = out.map(e => s.indexOf(e))
      assert(idxs == idxs.sorted)
    }
  }

  test("property: merge of timed streams is time-ordered and multiset-preserving") {
    streams.zip(streams.reverse).foreach { case (a, b) =>
      val at = a.filter(_.isTimed)
      val bt = b.filter(_.isTimed)
      val m = Interpreter.streamMerge(List(at, bt))
      assert(m.length == at.length + bt.length)
      val times = m.map(_.time.get.getTime)
      assert(times == times.sorted)
    }
  }

  test("property: chop windows partition exactly the data events") {
    for (s <- streams; n <- Seq(1, 2, 5)) {
      val windows = WindowMakers.chop[Any](n)(s)
      assert(windows.flatten == s.filter(_.isData))
      assert(windows.dropRight(1).forall(_.length == n))
    }
  }

  test("property: sliding windows each start at consecutive data events") {
    for (s <- streams; n <- Seq(1, 3)) {
      val d = s.filter(_.isData)
      val windows = WindowMakers.sliding[Any](n)(s)
      assert(windows.length == d.length)
      windows.zipWithIndex.foreach { case (w, i) => assert(w == d.slice(i, i + n)) }
    }
  }

  test("property: every default rewrite rule is sound on random streams") {
    val g = StreamGraph.path(Seq(
      StreamVertex(0, OpSource(1), Nil, "Int", "Int", 1),
      StreamVertex(1, OpMap,
        List(Param("abs", (v: Any) => math.abs(v.asInstanceOf[Int]): Any)), "Int", "Int", 1),
      StreamVertex(2, OpFilter(0.5),
        List(Param("(<25)", (v: Any) => v.asInstanceOf[Int] < 25)), "Int", "Int", 1),
      StreamVertex(3, OpFilter(0.5),
        List(Param("(>-30)", (v: Any) => v.asInstanceOf[Int] > -30)), "Int", "Int", 1),
      StreamVertex(4, OpScan, List(
        Param("sum", (acc: Any, v: Any) => (acc.asInstanceOf[Int] + v.asInstanceOf[Int]): Any),
        Param("0", 0: Any)), "Int", "Int", 1),
      StreamVertex(5, OpSink, Nil, "Int", "Int", 1)))
    val variants = Rules.rewriteGraph(Rules.defaultRules, g, depth = 2)
    streams.take(25).foreach { s =>
      val in = Map(0 -> s)
      val expected = Interpreter.runToSinks(g, in)
      variants.foreach { v =>
        assert(Interpreter.runToSinks(v.graph, in) == expected, s"unsound: ${v.sequence}")
      }
    }
  }
}
