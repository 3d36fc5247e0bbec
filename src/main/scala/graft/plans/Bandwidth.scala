package graft.plans

/** Bandwidth cost model (reference `src/Striot/Bandwidth.hs`): per-edge
  * egress estimated as departure-rate × on-wire event size, plus a fixed
  * per-event transport overhead; used to reject deployment plans whose
  * source-partition cut edges exceed a bandwidth limit.
  *
  * Event sizes are table-driven by type string. The reference measures
  * `Data.Store` encodings (`Bandwidth.hs:65-74`); our defaults model a
  * compact binary envelope (8-byte timestamp + presence bytes) with typical
  * payload sizes — callers supply their own table for real deployments
  * (e.g. measured Kryo/Tungsten row sizes).
  */
object Bandwidth {

  /** Default on-wire event sizes by payload type string: envelope (timestamp
    * + presence) + payload. */
  val defaultEventSizes: Map[String, Int] = {
    val envelope = 10
    Map(
      "Int"           -> (envelope + 8),
      "Double"        -> (envelope + 8),
      "Char"          -> (envelope + 2),
      "String1"       -> (envelope + 3),
      "String2"       -> (envelope + 4),
      "String3"       -> (envelope + 5),
      "(Int,Int,Int)" -> (envelope + 24),
      "PebbleMode60"  -> (envelope + 32))
  }

  /** Mean event departure rate of a vertex (reference `departRate :99-122`):
    * sources emit at their rate, merges sum, joins take the min input,
    * filters attenuate, and a `chopTime ms` window emits 1/period. Window
    * params are recognized by source form `chopTime <ms>`. */
  def departRate(g: StreamGraph, id: Int): Double = {
    val v = g.byId(id)
    lazy val parents = g.predecessors(id)
    v.op match {
      case OpSource(r)    => r
      case OpMerge        => parents.map(departRate(g, _)).sum
      case OpJoin         => parents.map(departRate(g, _)).min
      case OpFilter(s)    => s * departRate(g, parents.head)
      case OpFilterAcc(s) => s * departRate(g, parents.head)
      case OpWindow =>
        chopTimeMs(v) match {
          case Some(ms) => 1.0 / (ms / 1000.0)
          case None     => departRate(g, parents.head)
        }
      case _ => parents.headOption.map(departRate(g, _)).getOrElse(0.0)
    }
  }

  private def chopTimeMs(v: StreamVertex): Option[Double] =
    // toDoubleOption, not a digit-class guard: "1.2.3" or "." would pass a
    // character filter and crash costing with NumberFormatException instead
    // of being treated as an unrecognized window form
    v.params.headOption.map(_.src.trim.split("\\s+").toList).flatMap {
      case "chopTime" :: ms :: _ => ms.toDoubleOption.filter(d => d > 0 && d.isFinite)
      case _                     => None
    }

  /** Estimated payload size of a chopTime window's list output
    * (reference `chopSize :142-152`): parent event size × events per
    * window. */
  def chopSize(g: StreamGraph, id: Int, ms: Double,
               sizes: Map[String, Int] = defaultEventSizes): Option[Double] = {
    val pid = g.predecessors(id).head
    val pv = g.byId(pid)
    sizes.get(pv.outType).map { psize =>
      val prate = departRate(g, pid)
      val eventsInWindow = (ms / 1000.0) * prate
      psize * eventsInWindow
    }
  }

  /** Egress bandwidth out of a vertex: departure rate × event size
    * (reference `whatBandwidth :155-163`). */
  def whatBandwidth(g: StreamGraph, id: Int,
                    sizes: Map[String, Int] = defaultEventSizes): Option[Double] = {
    val v = g.byId(id)
    val outRate = departRate(g, id)
    val outSize: Option[Double] = v.op match {
      case OpWindow if chopTimeMs(v).isDefined => chopSize(g, id, chopTimeMs(v).get, sizes)
      case _                                   => sizes.get(v.outType).map(_.toDouble)
    }
    outSize.map(_ * outRate)
  }

  /** Per-event transport overhead (TCP+IP headers), bytes
    * (reference `weighting :167-168`). */
  val overheadPerEvent: Double = 60.0

  def whatBandwidthWeighted(g: StreamGraph, id: Int,
                            sizes: Map[String, Int] = defaultEventSizes): Option[Double] =
    whatBandwidth(g, id, sizes).map(_ + departRate(g, id) * overheadPerEvent)

  /** Node ids in partitions containing a source
    * (reference `connectedToSources :187-191`). */
  def connectedToSources(sourceIds: Seq[Int], pm: Seq[Seq[Int]]): Seq[Int] =
    pm.filter(p => p.exists(sourceIds.contains)).flatten

  /** Does any edge leaving a source partition exceed the bandwidth limit?
    * (reference `overBandwidthLimit :174-184`). */
  def overBandwidthLimit(g: StreamGraph, pm: Seq[Seq[Int]], limit: Double,
                         sizes: Map[String, Int] = defaultEventSizes): Boolean = {
    val sourceIds = g.sources.map(_.id)
    val connected = connectedToSources(sourceIds, pm).toSet
    g.edges.exists { case (a, b) =>
      connected.contains(a) && !connected.contains(b) &&
        whatBandwidthWeighted(g, a, sizes).exists(_ > limit)
    }
  }
}
