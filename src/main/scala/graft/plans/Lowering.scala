package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

import graft.core.Event

/** Lower a [[StreamGraph]] to executing Spark Datasets. The graph's params
  * are opaque `Any => Any` closures (the graph IR is the reference's
  * stringly/quoted authoring surface), so the lowered pipeline runs on
  * kryo-encoded `Event[Any]` rows: correct, distributed for the stateless
  * operators, and single-ordered-partition for the order-dependent ones —
  * the same discipline as the typed surface.
  *
  * This is the authoring-parity execution path (StreamGraph in, results
  * out, after rewrite rules and cost analysis). Production pipelines use
  * the typed `Dataset[Event[A]]` operators or the DataFrame formulations,
  * where Catalyst sees real schemas and can optimize; a lowered graph
  * executes but is opaque to Catalyst by construction.
  */
object Lowering {

  implicit private val enc: Encoder[Event[Any]] = Encoders.kryo[Event[Any]]

  /** Merge sort key — the shared [[Event.orderKey]] (µs time + stable
    * content-hash tiebreak; untimed events keep the union's order,
    * matching the reference's arbitrary-interleave contract). */
  private def keyOf(e: Event[Any]): (Long, Int) = Event.orderKey(e)

  /** Evaluate every vertex; returns each vertex's output Dataset. */
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
        case OpFilterAcc(_) =>
          val accfn = v.params(0).fn.asInstanceOf[(Any, Any) => Any]
          val init = v.params(1).fn
          val pred = v.params(2).fn.asInstanceOf[(Any, Any) => Boolean]
          in0.coalesce(1).mapPartitions { it =>
            var acc = init
            it.flatMap { e =>
              e.value match {
                case Some(x) =>
                  val keep = pred(x, acc); acc = accfn(acc, x)
                  if (keep) Iterator.single(e) else Iterator.empty
                case None => Iterator.single(e)
              }
            }
          }
        case OpScan if v.params.length >= 3 =>
          // MONOID scan: a third `merge` param declares the fold associative
          // with `init` as identity (merge(a, fold-from-init(xs)) ==
          // fold-from-a(xs)), which unlocks the distributed prefix-scan —
          // the 100 TB shape for a GLOBAL running aggregate. Range-partition
          // by the stream order, fold each partition independently from
          // init, combine the (numPartitions-sized) partials on the driver
          // into per-partition offsets, then re-fold each partition from its
          // offset. Two passes over a localCheckpoint'ed sort, one tiny
          // driver combine — no single ordered partition anywhere.
          distributedScan(spark, in0,
            v.params(0).fn.asInstanceOf[(Any, Any) => Any],
            v.params(1).fn,
            v.params(2).fn.asInstanceOf[(Any, Any) => Any])
        case OpScan =>
          val f = v.params(0).fn.asInstanceOf[(Any, Any) => Any]
          val init = v.params(1).fn
          in0.coalesce(1).mapPartitions { it =>
            var acc = init
            it.map { e =>
              e.value match {
                case Some(x) => acc = f(acc, x); Event(e.time, Some(acc))
                case None    => Event[Any](e.time, None)
              }
            }
          }
        case OpWindow =>
          val wm = v.params.head.fn.asInstanceOf[List[Event[Any]] => List[List[Event[Any]]]]
          in0.coalesce(1).mapPartitions { it =>
            wm(it.toList).iterator.map {
              case Nil => Event[Any](None, Some(Nil: List[Any]))
              case w   => Event(w.head.time, Some(w.filter(_.isData).map(_.value.get): Any))
            }
          }
        case OpMerge =>
          // n-ary union, re-ordered by event time (reference merge-sort)
          val union: RDD[Event[Any]] = ins.map(_.rdd).reduce(_ union _)
          spark.createDataset(union.sortBy(keyOf, ascending = true, numPartitions = 1))
        case OpJoin =>
          val l = ins(0).coalesce(1).rdd
          val r = ins(1).coalesce(1).rdd
          spark.createDataset(l.zipPartitions(r) { (li, ri) =>
            li.filter(_.isData).zip(ri.filter(_.isData)).map { case (a, b) =>
              Event(a.time, Some((a.value.get, b.value.get): Any))
            }
          })
      }
      out += v.id -> ds
    }
    out
  }

  /** Distributed prefix-scan for monoid folds (see the OpScan 3-param
    * case) — delegates to the typed surface's
    * [[graft.core.StreamOps.RichStream.streamScanMonoid]], which owns the
    * algorithm (range-partitioned sort, per-partition folds, driver
    * combine of numPartitions accumulators, offset re-fold; eager). */
  private def distributedScan(spark: SparkSession, in0: Dataset[Event[Any]],
                              f: (Any, Any) => Any, init: Any,
                              merge: (Any, Any) => Any): Dataset[Event[Any]] = {
    import graft.core.StreamOps._
    in0.streamScanMonoid[Any](f, init, merge)
  }

  /** Lower and collect each sink's stream (ordering as produced). */
  def runToSinks(spark: SparkSession, g: StreamGraph,
                 sources: Map[Int, List[Event[Any]]]): Map[Int, List[Event[Any]]] = {
    val srcDs = sources.map { case (id, evs) =>
      id -> spark.createDataset(spark.sparkContext.parallelize(evs, 1))
    }
    val all = lower(spark, g, srcDs)
    g.sinks.map(s => s.id -> all(s.id).collect().toList).toMap
  }
}
