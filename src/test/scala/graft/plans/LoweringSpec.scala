package graft.plans

import graft.SparkSuite
import graft.core.Event

/** The Spark lowering must agree with the list interpreter (the semantic
  * ground truth) — including on graphs produced by the rewrite rules. */
class LoweringSpec extends SparkSuite {

  private def pred(src: String)(f: Int => Boolean) =
    Param(src, (v: Any) => f(v.asInstanceOf[Int]))
  private def mapP(src: String)(f: Int => Int) =
    Param(src, (v: Any) => f(v.asInstanceOf[Int]): Any)

  private val pipeline = StreamGraph.path(Seq(
    StreamVertex(0, OpSource(1), Nil, "Int", "Int", 1),
    StreamVertex(1, OpMap, List(mapP("(*2)")(_ * 2)), "Int", "Int", 1),
    StreamVertex(2, OpFilter(0.5), List(pred("(>2)")(_ > 2)), "Int", "Int", 1),
    StreamVertex(3, OpScan, List(
      Param("sum", (acc: Any, v: Any) => (acc.asInstanceOf[Int] + v.asInstanceOf[Int]): Any),
      Param("0", 0: Any)), "Int", "Int", 1),
    StreamVertex(4, OpWindow, List(
      Param("chop 2", (s: List[Event[Any]]) => graft.core.WindowMakers.chop[Any](2)(s))),
      "Int", "[Int]", 1),
    StreamVertex(5, OpExpand, Nil, "[Int]", "Int", 1),
    StreamVertex(6, OpSink, Nil, "Int", "Int", 1)))

  private val input: Map[Int, List[Event[Any]]] =
    Map(0 -> (1 to 6).map(i => Event.data(i * 10L, i: Any)).toList)

  test("lowered pipeline matches the list interpreter") {
    val expected = Interpreter.runToSinks(pipeline, input)
    val got = Lowering.runToSinks(spark, pipeline, input)
    assert(got == expected)
  }

  test("lowered merge + zip join match the interpreter") {
    val g = {
      val s0 = StreamVertex(0, OpSource(1), Nil, "Int", "Int", 1)
      val s1 = StreamVertex(1, OpSource(1), Nil, "Int", "Int", 1)
      val m = StreamVertex(2, OpMerge, Nil, "Int", "Int", 1)
      val s2 = StreamVertex(3, OpSource(1), Nil, "Int", "Int", 1)
      val j = StreamVertex(4, OpJoin, Nil, "Int", "(Int,Int)", 1)
      val k = StreamVertex(5, OpSink, Nil, "(Int,Int)", "(Int,Int)", 1)
      StreamGraph.path(Seq(s0, m, j, k))
        .overlay(StreamGraph.path(Seq(s1, m)))
        .overlay(StreamGraph.path(Seq(s2, j)))
    }
    val ins: Map[Int, List[Event[Any]]] = Map(
      0 -> List(Event.data(0L, 1: Any), Event.data(20L, 3: Any)),
      1 -> List(Event.data(10L, 2: Any)),
      3 -> List(Event.data(100L, 10: Any), Event.data(200L, 20: Any)))
    val expected = Interpreter.runToSinks(g, ins)
    val got = Lowering.runToSinks(spark, g, ins)
    assert(got == expected)
  }

  test("monoid scan (3-param) distributes yet matches the interpreter exactly") {
    // same pipeline, but the scan declares (sum, 0, +) a monoid — Lowering
    // takes the distributed prefix-scan path (range partition + partial
    // folds + driver combine) instead of coalesce(1); results must be
    // IDENTICAL to the sequential interpreter (Int arithmetic: exact)
    val monoid = StreamGraph.path(Seq(
      StreamVertex(0, OpSource(1), Nil, "Int", "Int", 1),
      StreamVertex(1, OpMap, List(mapP("(*2)")(_ * 2)), "Int", "Int", 1),
      StreamVertex(2, OpFilter(0.5), List(pred("(>2)")(_ > 2)), "Int", "Int", 1),
      StreamVertex(3, OpScan, List(
        Param("sum", (acc: Any, v: Any) => (acc.asInstanceOf[Int] + v.asInstanceOf[Int]): Any),
        Param("0", 0: Any),
        Param("(+)", (a: Any, b: Any) => (a.asInstanceOf[Int] + b.asInstanceOf[Int]): Any)),
        "Int", "Int", 1),
      StreamVertex(4, OpSink, Nil, "Int", "Int", 1)))
    val bigInput: Map[Int, List[Event[Any]]] =
      Map(0 -> (1 to 500).map(i => Event.data(i * 10L, i: Any)).toList)
    val expected = Interpreter.runToSinks(monoid, bigInput)
      .values.head.map(e => (e.time, e.value)).sortBy(_._1.map(_.getTime))
    val sunk = Lowering.runToSinks(spark, monoid, bigInput)
      .values.head.map(e => (e.time, e.value)).sortBy(_._1.map(_.getTime))
    assert(sunk == expected)
    // and the lowered plan must not have collapsed to one partition
    val lowered = Lowering.lower(spark,
      monoid,
      Map(0 -> spark.createDataset(spark.sparkContext.parallelize(
        bigInput(0), 8))(org.apache.spark.sql.Encoders.kryo[Event[Any]])))(4)
    assert(lowered.rdd.getNumPartitions > 1,
      "monoid scan must stay distributed (no coalesce(1))")
  }

  test("rewritten variants execute identically on Spark") {
    val variants = Rules.rewriteGraph(Rules.defaultRules, pipeline, depth = 2)
    val expected = Interpreter.runToSinks(pipeline, input).values.toList
    variants.take(8).foreach { v =>
      val got = Lowering.runToSinks(spark, v.graph, input).values.toList
      assert(got == expected, s"variant ${v.sequence} diverged on Spark")
    }
  }
}
