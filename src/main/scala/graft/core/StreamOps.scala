package graft.core

import org.apache.spark.sql.{Dataset, Encoder}

import graft.core.WindowMakers.WindowMaker

/** The eight fundamental stream operators as typed `Dataset[Event[A]]`
  * combinators, with the exact semantics of the reference
  * (`src/Striot/FunctionalProcessing.hs`, "The eight StrIoT low-level
  * operators"):
  *
  *   - value-less (time-tick) events pass through filter/map/filterAcc/scan
  *     untouched (and do not update accumulators);
  *   - windows are stamped with their first element's timestamp; an empty
  *     window becomes `Event(None, Some(Nil))`;
  *   - merge is an n-ary time-ordered union;
  *   - join is a pairwise zip of the two sides' data events.
  *
  * Execution model: stateless operators (filter/map/expand) are ordinary
  * Catalyst `Filter`/`Project`/`Generate` nodes and scale freely. The
  * order-dependent operators (filterAcc, scan, window, merge, zip-join) are
  * defined over a TOTALLY-ORDERED stream; this typed surface realizes them
  * faithfully on a single ordered partition (`coalesce(1).mapPartitions`),
  * which is the parity/oracle surface. At scale, use the per-key variants
  * here (`ByKey` — state partitioned across the cluster by key, ordered
  * within key, which is how a 100 TB stream is actually sharded) or the
  * DataFrame window-function formulations in [[graft.operators]] (lag /
  * running aggregates / frames — fully parallel).
  */
object StreamOps {

  implicit final class RichStream[A](private val ds: Dataset[Event[A]]) extends AnyVal {

    /** Keep events whose VALUE satisfies p; value-less events pass through.
      * Reference `FunctionalProcessing.hs:59-63`. */
    def streamFilter(p: A => Boolean): Dataset[Event[A]] =
      ds.filter((e: Event[A]) => e.value.forall(p))

    /** Transform the value, keep the timestamp; value-less events pass.
      * Reference `FunctionalProcessing.hs:67-71`. */
    def streamMap[B](f: A => B)(implicit enc: Encoder[Event[B]]): Dataset[Event[B]] =
      ds.map((e: Event[A]) => Event(e.time, e.value.map(f)))

    /** One output event per list element, each inheriting the source event's
      * timestamp; a value-less event passes through as-is.
      * Reference `FunctionalProcessing.hs:206-210`. */
    def streamExpand[B](implicit ev: A <:< Seq[B], enc: Encoder[Event[B]]): Dataset[Event[B]] =
      ds.flatMap((e: Event[A]) =>
        e.value match {
          case Some(vs) => ev(vs).map(v => Event(e.time, Some(v)))
          case None     => Seq(Event[B](e.time, None))
        })

    /** Stateful filter: accumulator updated on EVERY data event; the event is
      * emitted iff `p(value, accBefore)`; value-less events pass through
      * without touching the accumulator. Totally ordered single-partition
      * execution (parity surface) — see [[streamFilterAccByKey]] for the
      * sharded variant. Reference `FunctionalProcessing.hs:181-185`. */
    def streamFilterAcc[B](accfn: (B, A) => B, init: B)(p: (A, B) => Boolean): Dataset[Event[A]] =
      ds.coalesce(1).mapPartitions { it =>
        var acc = init
        it.flatMap { e =>
          e.value match {
            case Some(v) =>
              val keep = p(v, acc)
              acc = accfn(acc, v)
              if (keep) Iterator.single(e) else Iterator.empty
            case None => Iterator.single(e)
          }
        }
      }(ds.encoder)

    /** Running fold: emits the new accumulator after each data event;
      * value-less events pass through (without emitting an accumulator).
      * Reference `FunctionalProcessing.hs:188-191`. */
    def streamScan[B](f: (B, A) => B, init: B)(implicit enc: Encoder[Event[B]]): Dataset[Event[B]] =
      ds.coalesce(1).mapPartitions { it =>
        var acc = init
        it.map { e =>
          e.value match {
            case Some(v) =>
              acc = f(acc, v)
              Event(e.time, Some(acc))
            case None => Event[B](e.time, None)
          }
        }
      }

    /** DISTRIBUTED running fold for MONOID accumulators — the 100 TB form
      * of a GLOBAL [[streamScan]] (which is inherently single-partition
      * for arbitrary folds): when `merge` is associative with `init` as
      * identity and `merge(a, foldFromInit(xs)) == foldFromA(xs)` (true
      * for any `f(acc, x) = merge(acc, g(x))` monoid fold — sums, maxima,
      * counts, bitsets), the prefix-scan distributes: range-partition by
      * event time (content-hash tiebreak), fold each partition from
      * `init`, combine the numPartitions-sized partials on the driver
      * into per-partition offsets, re-fold from the offsets. Two passes
      * over a localCheckpoint'ed sort + one tiny driver combine; EAGER at
      * call time (the partial combine is an action). Caching contract:
      * the checkpoint blocks back the RETURNED dataset (unpersisting them
      * would truncate its lineage unrecoverably), so they live until the
      * result is garbage-collected — same contract as Dedup's
      * localCheckpoint'ed pipelines; don't call this just to inspect a
      * plan. Ticks pass through. Results are identical to
      * `streamScan(f, init)` on the time-ordered stream.
      *
      * REQUIRES every event to be timed: an untimed event's position in
      * the stream is its arrival order, and arrival order does not
      * survive the `repartitionByRange` shuffle (unlike the in-batch
      * stable-sort paths), so a scan prefix over untimed events would be
      * nondeterministic across runs. The per-partition fold rejects the
      * first untimed event it sees with a directed error; use
      * `streamScan` (single ordered partition) for streams that carry
      * untimed data events. */
    def streamScanMonoid[B](f: (B, A) => B, init: B, merge: (B, B) => B)(
        implicit enc: Encoder[Event[B]]): Dataset[Event[B]] = {
      import org.apache.spark.sql.{Encoders, functions => F}
      val spark = ds.sparkSession
      implicit val encKeyed: Encoder[(Long, Int, Event[A])] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, ds.encoder)
      val parts = math.max(ds.rdd.getNumPartitions, 1)
      val sorted = ds
        .map { e => val k = Event.orderKey(e); (k._1, k._2, e) }
        .repartitionByRange(parts, F.col("_1"), F.col("_2"))
        .sortWithinPartitions(F.col("_1"), F.col("_2"))
        .localCheckpoint()
      val partials = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
        var acc = init
        it.foreach { case (_, _, e) =>
          if (e.time.isEmpty && e.value.nonEmpty)
            throw new IllegalArgumentException(
              "streamScanMonoid requires timed events: an untimed data event's " +
                "stream position is its arrival order, which does not survive the " +
                "range-partition shuffle, so its scan prefix would be " +
                "nondeterministic. Stamp events at ingest, or use streamScan " +
                "(single ordered partition) for untimed streams.")
          e.value.foreach(x => acc = f(acc, x))
        }
        Iterator.single((i, acc))
      }.collect().sortBy(_._1).toVector.map(_._2)
      val offsets = partials.scanLeft(init)(merge).dropRight(1)
      val bc = spark.sparkContext.broadcast(offsets)
      implicit val ctE: scala.reflect.ClassTag[Event[B]] =
        scala.reflect.ClassTag(classOf[Event[_]]).asInstanceOf[scala.reflect.ClassTag[Event[B]]]
      val outRdd = sorted.rdd.mapPartitionsWithIndex[Event[B]] { (i, it) =>
        var acc = bc.value(i)
        it.map { case (_, _, e) =>
          e.value match {
            case Some(x) => acc = f(acc, x); Event(e.time, Some(acc))
            case None    => Event[B](e.time, None)
          }
        }
      }
      spark.createDataset(outRdd)
    }

    /** Slice the stream into sub-streams with a [[WindowMakers.WindowMaker]];
      * each window becomes one event stamped with its first element's
      * timestamp (empty window → `Event(None, Some(Nil))`), carrying the
      * window's data values. Reference `FunctionalProcessing.hs:74-86`. */
    def streamWindow(fwm: WindowMaker[A])(implicit enc: Encoder[Event[Seq[A]]]): Dataset[Event[Seq[A]]] =
      ds.coalesce(1).mapPartitions { it =>
        fwm(it.toList).iterator.map {
          case Nil => Event[Seq[A]](None, Some(Nil))
          case w   => Event(w.head.time, Some(w.filter(_.isData).map(_.value.get)))
        }
      }

    /** `streamMap(agg) ∘ streamWindow(fwm)` — reference
      * `FunctionalProcessing.hs:89-90`. */
    def streamWindowAggregate[B](fwm: WindowMaker[A])(agg: Seq[A] => B)(
        implicit encW: Encoder[Event[Seq[A]]], encB: Encoder[Event[B]]): Dataset[Event[B]] =
      streamWindow(fwm).streamMap(agg)

    /** Re-stamp events from a payload field — the reference's custom
      * window-maker pattern (`tripTimes`/`pebbleTimes`,
      * `examples/taxi/Taxi.hs:400-402`, `WearableExample.hs:189-190`):
      * event time taken from inside the value. */
    def streamRestamp(f: A => java.sql.Timestamp): Dataset[Event[A]] =
      ds.map((e: Event[A]) => Event(e.value.map(f), e.value))(ds.encoder)

    /** Fold a finite stream's data values to a single value (the
      * reference's documented-but-unimplemented `streamReduce` design,
      * `docs/Operators.md:385-435`) — in Spark a distributed `reduce`. */
    def streamReduce(f: (A, A) => A)(implicit encA: Encoder[A]): Option[A] = {
      val data = ds.filter((e: Event[A]) => e.isData).map(_.value.get)
      if (data.isEmpty) None else Some(data.reduce(f))
    }

    /** N-ary union preserving time order (merge-sort on timestamps;
      * reference-arbitrary interleave for untimed events).
      * Reference `FunctionalProcessing.hs:135-144`. */
    def streamMerge(others: Dataset[Event[A]]*): Dataset[Event[A]] = {
      val unioned = others.foldLeft(ds)(_ unionByName _)
      unioned.coalesce(1).sortWithinPartitions("time")
    }

    /** Pairwise zip of the two streams' DATA events (k-th with k-th); the
      * output takes the LEFT event's timestamp; stops at the shorter stream.
      * Reference `FunctionalProcessing.hs:148-155`. */
    def streamZipJoin[B](other: Dataset[Event[B]])(
        implicit enc: Encoder[Event[(A, B)]]): Dataset[Event[(A, B)]] = {
      val l = ds.coalesce(1)
      val r = other.coalesce(1)
      val zipped = l.rdd.zipPartitions(r.rdd) { (li, ri) =>
        val lv = li.filter(_.isData)
        val rv = ri.filter(_.isData)
        lv.zip(rv).map { case (a, b) => Event(a.time, Some((a.value.get, b.value.get))) }
      }
      ds.sparkSession.createDataset(zipped)
    }

    /** Windowed theta-join: window both sides, zip windows pairwise,
      * cartesian product within the pair, filter, map, expand.
      * Reference `FunctionalProcessing.hs:161-173`. */
    def streamJoinE[B, C](fwm1: WindowMaker[A], fwm2: WindowMaker[B])(
        jf: (A, B) => Boolean)(jm: (A, B) => C)(other: Dataset[Event[B]])(
        implicit encWA: Encoder[Event[Seq[A]]], encWB: Encoder[Event[Seq[B]]],
        encP: Encoder[Event[(Seq[A], Seq[B])]], encLC: Encoder[Event[Seq[C]]],
        encC: Encoder[Event[C]]): Dataset[Event[C]] =
      streamWindow(fwm1)
        .streamZipJoin(other.streamWindow(fwm2))
        .streamMap { case (w1, w2) =>
          (for { a <- w1; b <- w2 if jf(a, b) } yield jm(a, b)): Seq[C]
        }
        .streamExpand

    /** Window-pair join: zip windows pairwise, apply a whole-window combiner.
      * Window lengths may differ per side (taxi Q2 uses 15 min vs 30 min).
      * Reference `FunctionalProcessing.hs:175-178`. */
    def streamJoinW[B, C](fwm1: WindowMaker[A], fwm2: WindowMaker[B])(
        f: (Seq[A], Seq[B]) => C)(other: Dataset[Event[B]])(
        implicit encWA: Encoder[Event[Seq[A]]], encWB: Encoder[Event[Seq[B]]],
        encP: Encoder[Event[(Seq[A], Seq[B])]], encC: Encoder[Event[C]]): Dataset[Event[C]] =
      streamWindow(fwm1)
        .streamZipJoin(other.streamWindow(fwm2))
        .streamMap { case (w1, w2) => f(w1, w2) }
  }

  /** Sharded stateful variants: total order is maintained PER KEY (the way an
    * unbounded stream is actually partitioned on a cluster).
    *
    * Execution is SECONDARY SORT, not `groupByKey.flatMapGroups`: one hash
    * exchange on the key, a spillable in-partition sort on (key, time), and
    * a single streaming pass over the key-runs. A `flatMapGroups` +
    * `toIndexedSeq.sortBy` formulation buffers each key's ENTIRE history in
    * executor memory before sorting — a hot key OOMs the executor at scale.
    * Here the sort spills through Spark's external sorter and the operator
    * state is just the accumulator (O(1) per key), so a key of any size
    * streams through. */
  implicit final class KeyedStream[A](private val ds: Dataset[Event[A]]) extends AnyVal {

    private def keyedSorted[K](key: Event[A] => K)(
        implicit encKE: Encoder[(K, Event[A])]): Dataset[(K, Event[A])] =
      ds.map(e => (key(e), e))
        .repartition(org.apache.spark.sql.functions.col("_1"))
        // time sorts nulls-first: value-less/timeless ticks lead their key,
        // matching the previous Long.MinValue ordering
        .sortWithinPartitions(
          org.apache.spark.sql.functions.col("_1"),
          org.apache.spark.sql.functions.col("_2.time"))

    def streamFilterAccByKey[K, B](key: Event[A] => K, accfn: (B, A) => B, init: B)(
        p: (A, B) => Boolean)(implicit encK: Encoder[K], encKE: Encoder[(K, Event[A])]): Dataset[Event[A]] = {
      implicit val encE: Encoder[Event[A]] = ds.encoder
      keyedSorted(key).mapPartitions { it =>
        var started = false
        var cur: K = null.asInstanceOf[K]
        var acc = init
        it.flatMap { case (k, e) =>
          if (!started || k != cur) { started = true; cur = k; acc = init }
          e.value match {
            case Some(v) =>
              val keep = p(v, acc)
              acc = accfn(acc, v)
              if (keep) Iterator.single(e) else Iterator.empty
            case None => Iterator.single(e)
          }
        }
      }
    }

    def streamScanByKey[K, B](key: Event[A] => K, f: (B, A) => B, init: B)(
        implicit encK: Encoder[K], encKE: Encoder[(K, Event[A])],
        enc: Encoder[Event[B]]): Dataset[Event[B]] =
      keyedSorted(key).mapPartitions { it =>
        var started = false
        var cur: K = null.asInstanceOf[K]
        var acc = init
        it.map { case (k, e) =>
          if (!started || k != cur) { started = true; cur = k; acc = init }
          e.value match {
            case Some(v) => acc = f(acc, v); Event(e.time, Some(acc))
            case None    => Event[B](e.time, None)
          }
        }
      }
  }
}
