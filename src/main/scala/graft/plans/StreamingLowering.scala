package graft.plans

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Event

/** Lower a [[StreamGraph]] onto Structured Streaming. The reference's
  * program is ONE totally-ordered stream consumed by a single-threaded
  * interpreter (`Nodes.hs`); the streaming equivalent keeps the stateful
  * operators' state in a single `flatMapGroupsWithState` group (constant
  * key), processing each micro-batch in event-time order — the honest
  * streaming translation of that contract. Stateless operators lower to
  * ordinary streaming transformations and parallelize freely.
  *
  * Supported: Source, Map, Filter, Expand, Merge (unordered union —
  * downstream event-time logic re-imposes order, matching SURVEY §2.1's
  * merge relaxation), FilterAcc, Scan, Sink.
  * Unsupported (throws): Window and Join — arbitrary window makers and
  * zip joins need the batch surface; use [[graft.streaming.StreamingOps]]
  * watermarked aggregations / [[graft.streaming.StreamJoins]] for the
  * streaming-native forms.
  */
object StreamingLowering {

  implicit private val enc: Encoder[Event[Any]] = Encoders.kryo[Event[Any]]
  implicit private val encKeyed: Encoder[(Int, Event[Any])] =
    Encoders.tuple(Encoders.scalaInt, enc)
  implicit private val encState: Encoder[Any] = Encoders.kryo[Any]

  def lower(spark: SparkSession, g: StreamGraph,
            sources: Map[Int, Dataset[Event[Any]]]): Map[Int, Dataset[Event[Any]]] = {
    var out = Map.empty[Int, Dataset[Event[Any]]]
    for (v <- g.topoOrder) {
      val ins = g.predecessors(v.id).map(out)
      def in0 = ins.head
      val ds: Dataset[Event[Any]] = v.op match {
        case OpSource(_) => sources(v.id)
        case OpSink      => in0
        case OpMap =>
          val f = v.params.head.fn.asInstanceOf[Any => Any]
          in0.map(e => Event(e.time, e.value.map(f)))
        case OpFilter(_) =>
          val p = v.params.head.fn.asInstanceOf[Any => Boolean]
          in0.filter((e: Event[Any]) => e.value.forall(p))
        case OpExpand =>
          in0.flatMap { e =>
            e.value match {
              case Some(vs: Seq[_]) => vs.map(x => Event(e.time, Some(x: Any)))
              case Some(other)      => Seq(Event(e.time, Some(other)))
              case None             => Seq(Event[Any](e.time, None))
            }
          }
        case OpMerge => ins.reduce(_ union _)
        case OpFilterAcc(_) =>
          val accfn = v.params(0).fn.asInstanceOf[(Any, Any) => Any]
          val init = v.params(1).fn
          val pred = v.params(2).fn.asInstanceOf[(Any, Any) => Boolean]
          statefulLower(in0) { (events, acc0) =>
            var acc = if (acc0 == null) init else acc0
            val kept = events.flatMap { e =>
              e.value match {
                case Some(x) =>
                  val keep = pred(x, acc); acc = accfn(acc, x)
                  if (keep) Some(e) else None
                case None => Some(e)
              }
            }
            (kept, acc)
          }
        case OpScan =>
          val f = v.params(0).fn.asInstanceOf[(Any, Any) => Any]
          val init = v.params(1).fn
          statefulLower(in0) { (events, acc0) =>
            var acc = if (acc0 == null) init else acc0
            val outEvs = events.map { e =>
              e.value match {
                case Some(x) => acc = f(acc, x); Event(e.time, Some(acc))
                case None    => Event[Any](e.time, None)
              }
            }
            (outEvs, acc)
          }
        case OpWindow | OpJoin =>
          throw new UnsupportedOperationException(
            s"${v.op.name} has no direct streaming lowering; use " +
              "graft.streaming.StreamingOps / StreamJoins for streaming-native forms")
      }
      out += v.id -> ds
    }
    out
  }

  /** Single-group stateful pass: micro-batch events sorted by event time,
    * folded through `step`, state carried across batches. */
  private def statefulLower(ds: Dataset[Event[Any]])(
      step: (IndexedSeq[Event[Any]], Any) => (IndexedSeq[Event[Any]], Any)): Dataset[Event[Any]] =
    ds.map(e => (0, e))
      .groupByKey(_._1)(Encoders.scalaInt)
      .flatMapGroupsWithState[Any, Event[Any]](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[(Int, Event[Any])], state: GroupState[Any]) =>
          val sorted = it.map(_._2).toIndexedSeq
            .sortBy(e => e.time.map(_.getTime).getOrElse(Long.MinValue))
          val (outEvs, acc) = step(sorted, state.getOption.orNull)
          state.update(acc)
          outEvs.iterator
      }
}
