package graft.core

/** Opt-in declaration that a custom window maker is BOUNDED-LOOKBACK:
  * every window it will ever emit spans at most `maxEvents` consecutive
  * input events, counted from the first event of its currently-open
  * (last, still-growable) window through the end of the stream seen so
  * far.
  *
  * Why this exists: the reference accepts ARBITRARY `WindowMaker`
  * closures (`src/Striot/FunctionalProcessing.hs:74-86`), and an
  * arbitrary closure may window any part of the stream — so the faithful
  * streaming lowering must buffer the whole prefix, O(prefix) state,
  * with a directed error past a cap. But the reference's own custom
  * makers (`tripTimes`, `examples/taxi/Taxi.hs:400-402`) are single-event
  * re-stampers: lookback 1. Wrapping such a maker in
  * `BoundedLookback(maxEvents = 1)(maker)` tells the streaming lowering
  * it may EVICT everything before the open window, keeping O(maxEvents)
  * state instead of O(prefix).
  *
  * The declaration is CHECKED, not trusted (the lying-Param pattern):
  * at every eviction the lowering re-applies the maker to the retained
  * suffix and requires it to reproduce the open window exactly and to
  * close nothing new — a maker whose output actually depends on evicted
  * events fails with a directed error at the first eviction where that
  * dependence shows in the open window (see
  * `graft.plans.StreamingLowering.boundedWindowLower` for the residual:
  * a dependence invisible in every open window but visible in later
  * windows is indistinguishable from bounded lookback at eviction time).
  *
  * The wrapper IS the maker (`Function1`), so the batch surface
  * (`StreamOps.streamWindow`, the plan interpreter) runs it unchanged —
  * the declaration only changes how the STREAMING lowering manages
  * state, never what is computed.
  */
final class BoundedLookback[A](val maxEvents: Int)(
    val maker: List[Event[A]] => List[List[Event[A]]])
    extends (List[Event[A]] => List[List[Event[A]]]) with Serializable {
  require(maxEvents > 0, s"BoundedLookback.maxEvents must be positive, got $maxEvents")
  override def apply(s: List[Event[A]]): List[List[Event[A]]] = maker(s)
}

object BoundedLookback {
  def apply[A](maxEvents: Int)(
      maker: List[Event[A]] => List[List[Event[A]]]): BoundedLookback[A] =
    new BoundedLookback(maxEvents)(maker)
}
