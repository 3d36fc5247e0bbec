package graft.core

import java.sql.Timestamp

/** The atom of a stream: an optional event-time plus an optional payload.
  *
  * Mirrors the reference's `Event alpha` (optional timestamp, optional
  * value; either may be absent — a pure time-tick, a pure datum, or both),
  * see reference `src/Striot/FunctionalIoTtypes.hs:23-30`.
  *
  * Spark representation: a case class row `struct<time: timestamp,
  * value: A>` with both fields nullable (`Option`), encoded with the
  * standard product encoder so Catalyst sees the full structure.
  */
case class Event[A](time: Option[Timestamp], value: Option[A]) {
  /** Event carries a payload (reference `dataEvent`). */
  def isData: Boolean = value.isDefined
  /** Event carries a timestamp (reference `timedEvent`). */
  def isTimed: Boolean = time.isDefined
}

object Event {
  def data[A](t: Long, v: A): Event[A] = Event(Some(new Timestamp(t)), Some(v))
  def dataOnly[A](v: A): Event[A] = Event(None, Some(v))
  def tick[A](t: Long): Event[A] = Event(Some(new Timestamp(t)), None)

  /** Epoch MICROSECONDS of a timestamp. Ordering events by
    * `Timestamp.getTime` (milliseconds) silently merges microsecond-distinct
    * events into ties — the testdata (and Spark's TimestampType) is
    * microsecond-granular, so every event-order-sensitive fold must sort by
    * this, not getTime. */
  def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
}
