package graft.plans

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.{Dataset, Encoders}

import graft.SparkSuite
import graft.core.Event

/** Randomized agreement between the stateful window/join lowerings and the
  * list interpreter. `flatMapGroupsWithState` also executes on BATCH
  * Datasets (one "micro-batch", empty initial state), so the lowering's
  * window semantics — value-less ticks, period-spanning gaps, random
  * window parameters — can be property-tested cheaply; the replay-based
  * StreamingLoweringSpec covers state across real micro-batch boundaries.
  * Streams here carry STRICTLY INCREASING event times: the micro-batch
  * sort orders only by time, so untimed events and exact ties have no
  * defined position in streaming mode (the interpreter's list order is a
  * stronger contract that only the batch surface honors). Streaming never
  * closes a trailing window, so the expected output is the interpreter's
  * minus the windows still pending at end-of-input. */
class LoweringPropertySpec extends SparkSuite {

  implicit private val enc: org.apache.spark.sql.Encoder[Event[Any]] = Encoders.kryo[Event[Any]]

  private val rnd = new Random(20260812L)

  private def randomStream(n: Int): List[Event[Any]] = {
    var t = 1704067200000L
    (1 to n).toList.map { i =>
      t += 250L + rnd.nextInt(5) * 250L // strictly increasing, gaps to 1.5s
      val value = if (rnd.nextInt(12) == 0) None else Some((i * 10): Any)
      Event(Some(new Timestamp(t)), value)
    }
  }

  private def windowGraph(src: String, fn: Any): StreamGraph =
    StreamGraph.path(Seq(
      StreamVertex(0, OpSource(1), Nil, "Int", "Int", 1),
      StreamVertex(1, OpWindow, List(Param(src, fn)), "Int", "[Int]", 1),
      StreamVertex(2, OpSink, Nil, "[Int]", "[Int]", 1)))

  private def runLowered(g: StreamGraph, input: List[Event[Any]]): List[(Long, List[Any])] = {
    val ds: Dataset[Event[Any]] = spark.createDataset(input)
    StreamingLowering.lower(spark, g, Map(0 -> ds))(2)
      .collect().toList
      .map(e => (e.time.map(_.getTime).getOrElse(-1L), e.value.get.asInstanceOf[List[Any]]))
      .sortBy(w => (w._1, w._2.mkString(",")))
  }

  private def interp(g: StreamGraph, input: List[Event[Any]]): List[Event[Any]] =
    Interpreter.runToSinks(g, Map(0 -> input)).values.head

  private def asPairs(ws: List[Event[Any]]): List[(Long, List[Any])] =
    ws.map(e => (e.time.map(_.getTime).getOrElse(-1L), e.value.get.asInstanceOf[List[Any]]))
      .sortBy(w => (w._1, w._2.mkString(",")))

  test("property: chop agrees with the interpreter minus the pending partial window") {
    for (_ <- 1 to 8) {
      val n = 2 + rnd.nextInt(4)
      val input = randomStream(30 + rnd.nextInt(40))
      val g = windowGraph(s"chop $n", (s: List[Event[Any]]) => graft.core.WindowMakers.chop[Any](n)(s))
      val expected = asPairs(interp(g, input).filter(_.value.get.asInstanceOf[List[Any]].length == n))
      assert(runLowered(g, input) == expected, s"chop $n")
    }
  }

  test("property: sliding agrees with the interpreter on full windows") {
    for (_ <- 1 to 8) {
      val n = 2 + rnd.nextInt(4)
      val input = randomStream(30 + rnd.nextInt(40))
      val g = windowGraph(s"sliding $n", (s: List[Event[Any]]) => graft.core.WindowMakers.sliding[Any](n)(s))
      val expected = asPairs(interp(g, input).filter(_.value.get.asInstanceOf[List[Any]].length == n))
      assert(runLowered(g, input) == expected, s"sliding $n")
    }
  }

  test("property: chopTime agrees with the interpreter minus the last open window") {
    for (_ <- 1 to 8) {
      val ms = 500L * (1 + rnd.nextInt(6))
      val input = randomStream(30 + rnd.nextInt(40))
      val g = windowGraph(s"chopTime $ms", (s: List[Event[Any]]) => graft.core.WindowMakers.chopTime[Any](ms)(s))
      val expected = asPairs(interp(g, input).dropRight(1))
      assert(runLowered(g, input) == expected, s"chopTime $ms")
    }
  }

  test("property: slidingTime agrees with the interpreter on closed windows") {
    for (_ <- 1 to 8) {
      val ms = 500L * (1 + rnd.nextInt(6))
      val input = randomStream(30 + rnd.nextInt(40))
      val g = windowGraph(s"slidingTime $ms", (s: List[Event[Any]]) => graft.core.WindowMakers.slidingTime[Any](ms)(s))
      val lastT = input.filter(_.isTimed).map(_.time.get.getTime).maxOption.getOrElse(Long.MinValue)
      // a window headed at h closes when some event reaches h + ms
      val expected = asPairs(interp(g, input).filter(e =>
        e.time.exists(t => t.getTime + ms <= lastT)))
      assert(runLowered(g, input) == expected, s"slidingTime $ms")
    }
  }

  test("property: distributed monoid scan agrees with the interpreter under random partitionings") {
    // ticks interleaved, arrival order shuffled, several partition counts:
    // the batch Lowering's prefix-scan must re-derive the sequential fold
    // exactly (Int arithmetic — no float association to hide behind)
    val sumP = Param("sum", (acc: Any, v: Any) => (acc.asInstanceOf[Int] + v.asInstanceOf[Int]): Any)
    val zeroP = Param("0", 0: Any)
    val mergeP = Param("(+)", (a: Any, b: Any) => (a.asInstanceOf[Int] + b.asInstanceOf[Int]): Any)
    val g = StreamGraph.path(Seq(
      StreamVertex(0, OpSource(1), Nil, "Int", "Int", 1),
      StreamVertex(1, OpMap, List(Param("(+1)",
        (v: Any) => (v.asInstanceOf[Int] + 1): Any)), "Int", "Int", 1),
      StreamVertex(2, OpScan, List(sumP, zeroP, mergeP), "Int", "Int", 1),
      StreamVertex(3, OpSink, Nil, "Int", "Int", 1)))
    for (trial <- 1 to 3) {
      val input = randomStream(80 + rnd.nextInt(80))
      val expected = interp(g, input)
        .map(e => (e.time.map(_.getTime).getOrElse(-1L), e.value))
        .sortBy(_._1)
      for (parts <- Seq(1, 3, 8)) {
        val shuffled = rnd.shuffle(input)
        val ds: Dataset[Event[Any]] =
          spark.createDataset(spark.sparkContext.parallelize(shuffled, parts))
        val got = Lowering.lower(spark, g, Map(0 -> ds))(3)
          .collect().toList
          .map(e => (e.time.map(_.getTime).getOrElse(-1L), e.value))
          .sortBy(_._1)
        assert(got == expected, s"trial $trial parts $parts")
      }
    }
  }

  test("property: batch-executed zip-join matches the interpreter zip exactly") {
    for (_ <- 1 to 5) {
      val a = randomStream(20 + rnd.nextInt(20))
      val b = randomStream(20 + rnd.nextInt(20))
      val g = StreamGraph(
        Vector(
          StreamVertex(0, OpSource(1), Nil, "Int", "Int", 1),
          StreamVertex(1, OpSource(1), Nil, "Int", "Int", 1),
          StreamVertex(2, OpJoin, Nil, "Int", "(Int,Int)", 1),
          StreamVertex(3, OpSink, Nil, "(Int,Int)", "(Int,Int)", 1)),
        Vector(0 -> 2, 1 -> 2, 2 -> 3))
      val dsA: Dataset[Event[Any]] = spark.createDataset(a)
      val dsB: Dataset[Event[Any]] = spark.createDataset(b)
      val got = StreamingLowering.lower(spark, g, Map(0 -> dsA, 1 -> dsB))(3)
        .collect().toList.map(e => e.value.get.asInstanceOf[(Any, Any)]).sortBy(_.toString)
      val expected = Interpreter.runToSinks(g, Map(0 -> a, 1 -> b)).values.head
        .map(_.value.get.asInstanceOf[(Any, Any)]).sortBy(_.toString)
      assert(got == expected)
    }
  }
}
