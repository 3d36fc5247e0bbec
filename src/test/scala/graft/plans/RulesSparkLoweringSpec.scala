package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.{Dataset, Encoders}

import graft.SparkSuite
import graft.core.Event

/** Rewrite-rule soundness THROUGH THE SPARK LOWERINGS, not just the list
  * interpreter: for random pipelines × random finite event streams, every
  * rule-rewritten variant must produce the same sink output as the
  * original when both are lowered to executing Spark Datasets — i.e. the
  * rules are sound against what Catalyst actually runs, closing the gap
  * where RulesSpec/RandomGraphSpec prove soundness only at the
  * interpreter and LoweringPropertySpec proves lowering≡interpreter only
  * for the ORIGINAL graph. (Composing those two facts covers variants
  * indirectly; this spec removes the indirection and would catch a
  * lowering bug triggered by rule-produced shapes — fused closures,
  * hoisted ops around Merge, filters pushed into windows — that the
  * hand-written originals never exhibit.)
  *
  * Both execution paths are exercised: the batch [[Lowering]] (full
  * window semantics, trailing windows included) and the stateful
  * [[StreamingLowering]] run on a batch Dataset as one micro-batch (the
  * LoweringPropertySpec trick) for window-free graphs, whose operators
  * all emit 1:1 with no pending tail — so variant equality is exact.
  */
class RulesSparkLoweringSpec extends SparkSuite {

  implicit private val enc: org.apache.spark.sql.Encoder[Event[Any]] = Encoders.kryo[Event[Any]]

  private def pred(src: String)(f: Int => Boolean) =
    Param(src, (v: Any) => f(v.asInstanceOf[Int]))
  private def mapP(src: String)(f: Int => Int) =
    Param(src, (v: Any) => f(v.asInstanceOf[Int]): Any)

  // pool of well-typed Int→Int middle stages; the expand entry is a PAIR
  // (map-to-list, expand) so Expand always sees a Seq payload — this is
  // what puts the expand* rule family in reach of the rewriter
  private val genMid: Gen[List[Int => StreamVertex]] = Gen.oneOf[List[Int => StreamVertex]](
    List((id: Int) => StreamVertex(id, OpMap, List(mapP("(+7)")(_ + 7)), "Int", "Int", 1)),
    List((id: Int) => StreamVertex(id, OpMap, List(mapP("(*2)")(_ * 2)), "Int", "Int", 1)),
    List((id: Int) => StreamVertex(id, OpFilter(0.5), List(pred("(>10)")(_ > 10)), "Int", "Int", 1)),
    List((id: Int) => StreamVertex(id, OpFilter(0.5), List(pred("even")(_ % 2 == 0)), "Int", "Int", 1)),
    List((id: Int) => StreamVertex(id, OpScan, List(
      Param("sum", (acc: Any, v: Any) => (acc.asInstanceOf[Int] + v.asInstanceOf[Int]): Any),
      Param("0", 0: Any)), "Int", "Int", 1)),
    List((id: Int) => StreamVertex(id, OpFilterAcc(0.5), List(
      Param("keepLast", (acc: Any, v: Any) => v),
      Param("None", None: Any),
      Param("!=prev", (v: Any, acc: Any) => acc != (v: Any))), "Int", "Int", 1)),
    List(
      (id: Int) => StreamVertex(id, OpMap, List(Param("pair",
        (v: Any) => List(v.asInstanceOf[Int], v.asInstanceOf[Int] + 1): Any)),
        "Int", "[Int]", 1),
      (id: Int) => StreamVertex(id, OpExpand, Nil, "[Int]", "Int", 1)))

  private def pipelineGen(withWindow: Boolean): Gen[StreamGraph] =
    for {
      n <- Gen.choose(1, 4)
      mids <- Gen.listOfN(n, genMid)
      window <- if (withWindow) Gen.oneOf(true, false) else Gen.const(false)
    } yield {
      val mk = mids.flatten
      val stages = mk.zipWithIndex.map { case (f, i) => f(i + 1) }
      val winId = stages.length + 1
      val tail =
        if (window)
          List(StreamVertex(winId, OpWindow, List(Param("chop 3",
            (s: List[Event[Any]]) => graft.core.WindowMakers.chop[Any](3)(s))),
            "Int", "[Int]", 1),
            StreamVertex(winId + 1, OpSink, Nil, "[Int]", "[Int]", 1))
        else List(StreamVertex(winId, OpSink, Nil, "Int", "Int", 1))
      StreamGraph.path(
        (StreamVertex(0, OpSource(1), Nil, "Int", "Int", 1) +: stages) ++ tail)
    }

  private def samples(g: Gen[StreamGraph], n: Int): Seq[StreamGraph] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1000L + i)))

  private val rnd = new scala.util.Random(20260814L)
  private def randomInput(): List[Event[Any]] = {
    var t = 1704067200000L
    (1 to (20 + rnd.nextInt(20))).toList.map { i =>
      t += 1000L
      Event(Some(new java.sql.Timestamp(t)), Some((rnd.nextInt(25)): Any))
    }
  }

  private def canon(evs: Seq[Event[Any]]): List[(Long, String)] =
    evs.map(e => (e.time.map(Event.micros).getOrElse(-1L), e.value.toString))
      .sortBy(identity).toList

  test("property: rule variants lowered through batch Lowering match the original") {
    val fired = scala.collection.mutable.Set.empty[String]
    samples(pipelineGen(withWindow = true), 25).foreach { g =>
      val input = randomInput()
      val sinkId = g.sinks.head.id
      val ds: Dataset[Event[Any]] = spark.createDataset(input)
      val expected = canon(Lowering.lower(spark, g, Map(0 -> ds))(sinkId).collect().toSeq)
      Rules.rewriteGraph(Rules.defaultRules, g, depth = 2).filter(_.sequence.nonEmpty)
        .foreach { v =>
          fired ++= v.sequence
          val vds: Dataset[Event[Any]] = spark.createDataset(input)
          val got = canon(Lowering.lower(spark, v.graph, Map(0 -> vds))(sinkId).collect().toSeq)
          assert(got == expected,
            s"variant ${v.sequence} diverges through the Spark lowering on:\n${g.show}")
        }
    }
    // the property is only as strong as its coverage: require that the
    // random adjacencies actually put ≥ 3 distinct rule families end to
    // end through Catalyst (the VERDICT r10 ask)
    assert(fired.size >= 3, s"only ${fired.size} rule families exercised: $fired")
  }

  test("property: rule variants through the stateful StreamingLowering match the original") {
    val fired = scala.collection.mutable.Set.empty[String]
    samples(pipelineGen(withWindow = false), 15).foreach { g =>
      val input = randomInput()
      val sinkId = g.sinks.head.id
      val ds: Dataset[Event[Any]] = spark.createDataset(input)
      val expected = canon(
        StreamingLowering.lower(spark, g, Map(0 -> ds))(sinkId).collect().toSeq)
      Rules.rewriteGraph(Rules.defaultRules, g, depth = 2).filter(_.sequence.nonEmpty)
        .foreach { v =>
          fired ++= v.sequence
          val vds: Dataset[Event[Any]] = spark.createDataset(input)
          val got = canon(
            StreamingLowering.lower(spark, v.graph, Map(0 -> vds))(sinkId).collect().toSeq)
          assert(got == expected,
            s"variant ${v.sequence} diverges through the streaming lowering on:\n${g.show}")
        }
    }
    assert(fired.size >= 3, s"only ${fired.size} rule families exercised: $fired")
  }
}
