package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's exact median — the UPPER middle element of the sorted
  * values (`examples/taxi/Taxi.hs:272-274`, index ⌊n/2⌋) — as a typed
  * `Aggregator[Double, _, Double]`, the engine-native custom-aggregate
  * surface (SURVEY §2.6: the reference's window aggregators are arbitrary
  * user functions; Spark's equivalent is `Aggregator`). Usable in typed
  * `groupByKey(...).agg(MedianUpperAgg.toColumn)` and registrable for SQL.
  *
  * Exact (buffers all values) — for the sketch-based large-window variant
  * use percentile_approx; this aggregator exists for reference parity. */
object MedianUpperAgg extends Aggregator[Double, ArrayBuffer[Double], Double] {

  override def zero: ArrayBuffer[Double] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = { b += a; b }

  override def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] =
    b1 ++= b2

  override def finish(r: ArrayBuffer[Double]): Double =
    if (r.isEmpty) Double.NaN
    else {
      val sorted = r.sorted
      sorted(sorted.length / 2)
    }

  override def bufferEncoder: Encoder[ArrayBuffer[Double]] =
    Encoders.kryo[ArrayBuffer[Double]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  def column: TypedColumn[Double, Double] = toColumn.name("median_upper")
}
