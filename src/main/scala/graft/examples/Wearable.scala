package graft.examples

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.{Event, WindowMakers}
import graft.core.StreamOps._

/** The reference's wearable step-counter pipeline
  * (`examples/wearable/WearableExample.hs:41-96`) composed on the TYPED
  * operator surface: accelerometer samples → vibe filter → Euclidean-norm
  * map (`edEvent :66-70`) → falling-edge step detection via
  * `streamFilterAcc` (`stepEvent :83-84`, threshold crossing downward) →
  * 120 ms tumbling count window (`stepCount :95-96`, `chopTime 120`). */
object Wearable {

  /** One accelerometer sample: x/y/z plus the vibration-motor flag. */
  final case class Sample(x: Int, y: Int, z: Int, vibe: Int)

  val Threshold = 100 // WearableExample.hs:81

  /** ed: filter vibe==0, map to the FLOORED Euclidean norm — the
    * reference's `intSqrt` truncates (`WearableExample.hs:66-70`), so a
    * `.round` here would flip step detection whenever the true norm's
    * fractional part is ≥ 0.5 around the threshold. */
  def ed(s: Dataset[Event[Sample]])(implicit spark: SparkSession): Dataset[Event[Int]] = {
    import spark.implicits._
    s.streamFilter(_.vibe == 0)
      .streamMap(p => math.sqrt((p.x.toLong * p.x + p.y.toLong * p.y + p.z.toLong * p.z).toDouble).toInt)
  }

  /** stepEvent: emit when the previous sample was above the threshold and
    * the current is at-or-below (falling edge), via `streamFilterAcc`
    * keeping the last value. */
  def stepEvent(s: Dataset[Event[Int]]): Dataset[Event[Int]] =
    s.streamFilterAcc[Option[Int]]((_, v) => Some(v), None)(
      (v, prev) => prev.exists(_ > Threshold) && v <= Threshold)

  /** stepCount: steps per 120 ms tumbling window (`chopTime 120`). */
  def stepCount(s: Dataset[Event[Int]])(implicit spark: SparkSession): Dataset[Event[Int]] = {
    import spark.implicits._
    s.streamWindowAggregate(WindowMakers.chopTime[Int](120))(_.length)
  }

  /** The full pipeline: samples in, per-window step counts out. */
  def pipeline(s: Dataset[Event[Sample]])(implicit spark: SparkSession): Dataset[Event[Int]] =
    stepCount(stepEvent(ed(s)))
}
