package graft.examples

import graft.SparkSuite
import graft.core.Event
import graft.examples.Wearable.Sample

/** The typed wearable pipeline on a hand-computable trace: norms cross the
  * threshold downward twice in distinct 120 ms windows → two windows with
  * one step each (reference `WearableExample.hs:66-96` semantics). */
class WearableSpec extends SparkSuite {
  import spark.implicits._
  implicit private val s: org.apache.spark.sql.SparkSession = spark

  test("wearable pipeline counts falling-edge steps per 120ms window") {
    // norms: 120, 50 (step), 120, 80 (step), 30
    val samples = Seq(
      Event.data(0L, Sample(120, 0, 0, 0)),
      Event.data(40L, Sample(50, 0, 0, 0)),   // falling edge -> step @40
      Event.data(80L, Sample(120, 0, 0, 0)),
      Event.data(160L, Sample(80, 0, 0, 0)),  // falling edge -> step @160
      Event.data(200L, Sample(30, 0, 0, 0)),
      Event.data(240L, Sample(200, 0, 0, 1))) // vibe on -> dropped
      .toDS()
    val out = Wearable.pipeline(samples).collect().toList
    // steps at t=40 and t=160; chopTime(120) anchored at first step (40):
    // windows [40,160) -> 1 step, [160,280) -> 1 step
    assert(out.map(_.value.get) == List(1, 1))
    assert(out.map(_.time.get.getTime) == List(40L, 160L))
  }

  test("norm floors like the reference intSqrt — no rounding up at .5") {
    // x=100,y=8,z=7: sqrt(10113) = 100.56… — intSqrt gives 100 (at/below
    // the 100 threshold), so the subsequent high sample is a RISE and the
    // low one after it a step; a .round norm (101) would instead put the
    // first sample above threshold, detecting a different step pattern
    val samples = Seq(
      Event.data(0L, Sample(120, 0, 0, 0)),  // above
      Event.data(40L, Sample(100, 8, 7, 0)), // 100.56 -> floor 100 = at-threshold (step!)
      Event.data(80L, Sample(30, 0, 0, 0)))  // below (no step: prev not > 100)
      .toDS()
    val edges = Wearable.stepEvent(Wearable.ed(samples)).collect().toList
    assert(edges.map(_.value.get) == List(100))
    assert(edges.map(_.time.get.getTime) == List(40L))
  }

  test("vibe filter removes vibrating samples before norm computation") {
    val samples = Seq(
      Event.data(0L, Sample(120, 0, 0, 1)),
      Event.data(40L, Sample(50, 0, 0, 1)))
      .toDS()
    assert(Wearable.pipeline(samples).collect().isEmpty)
  }
}
