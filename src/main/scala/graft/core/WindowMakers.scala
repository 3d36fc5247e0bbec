package graft.core

/** Window-maker library: pure list→list-of-lists slicers with the exact
  * semantics of the reference (`src/Striot/FunctionalProcessing.hs:93-132`).
  *
  * A `WindowMaker[A]` slices an ordered stream into (possibly overlapping)
  * sub-streams. These pure versions are the semantic ground truth used by the
  * typed `StreamOps.streamWindow` (single-ordered-partition execution) and by
  * unit tests; the scalable DataFrame formulations (window frames,
  * `window()` bucketing, row_number grouping) in [[graft.operators.Windows]]
  * must agree with them.
  */
object WindowMakers {

  type WindowMaker[A] = List[Event[A]] => List[List[Event[A]]]

  /** Per data event, a window of the next n events (count-based sliding,
    * slide = 1). Reference `FunctionalProcessing.hs:93-97`. */
  def sliding[A](n: Int): WindowMaker[A] = s => {
    val d = s.filter(_.isData)
    d.tails.takeWhile(_.nonEmpty).map(_.take(n)).toList
  }

  /** Per timed event e, the window of all events in [e.time, e.time+ms)
    * (time-based sliding, slide = every event). Window arithmetic in
    * MICROSECONDS — `getTime`'s ms granularity would misplace events within
    * 1 ms of a boundary on µs-granular streams.
    * Reference `FunctionalProcessing.hs:99-108`. */
  def slidingTime[A](ms: Long): WindowMaker[A] = s => {
    val timed = s.filter(_.isTimed)
    timed.tails.takeWhile(_.nonEmpty).map { tail =>
      val end = Event.micros(tail.head.time.get) + ms * 1000L
      tail.takeWhile(e => Event.micros(e.time.get) < end)
    }.toList
  }

  /** Non-overlapping windows of n data events.
    * Reference `FunctionalProcessing.hs:113-116`. */
  def chop[A](n: Int): WindowMaker[A] = s =>
    s.filter(_.isData).grouped(n).toList

  /** Non-overlapping fixed-duration windows aligned to the FIRST event's
    * timestamp (not epoch — Spark's `window()` aligns to epoch, so the
    * scalable formulation must offset). Drops untimed events. A gap spanning
    * a whole window period yields an EMPTY window (which `streamWindow` turns
    * into `Event(None, Some(Nil))`). Reference
    * `FunctionalProcessing.hs:118-129`. */
  def chopTime[A](ms: Long): WindowMaker[A] = s => {
    // µs arithmetic, as in slidingTime
    val timed = s.filter(_.isTimed)
    timed match {
      case Nil => Nil
      case first :: _ =>
        def loop(start: Long, rest: List[Event[A]]): List[List[Event[A]]] =
          rest match {
            case Nil => Nil
            case _ =>
              val end = start + ms * 1000L
              val (w, r) = rest.span(e => Event.micros(e.time.get) < end)
              w :: loop(end, r)
          }
        loop(Event.micros(first.time.get), timed)
    }
  }

  /** One window containing the entire (finite) stream.
    * Reference `FunctionalProcessing.hs:131-132`. */
  def complete[A]: WindowMaker[A] = s => List(s)
}
