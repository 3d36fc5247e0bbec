package graft.plans

import graft.core.Event

/** Reference-semantics list interpreter for [[StreamGraph]]s: evaluates a
  * graph over finite in-memory streams with exactly the semantics of the
  * reference's eight operators (`src/Striot/FunctionalProcessing.hs`). Used
  * to test rewrite-rule soundness (variant ≡ original on random finite
  * streams — a property test the reference itself lacks) and as the
  * executable ground truth the Spark lowering must agree with.
  *
  * Parameter calling conventions (see [[Param]]):
  *  - Filter:    `Any => Boolean`
  *  - Map:       `Any => Any`
  *  - FilterAcc: `[(acc,v)=>acc', init, (v,acc)=>Boolean]`
  *  - Scan:      `[(acc,v)=>acc', init]`
  *  - Window:    `List[Event[Any]] => List[List[Event[Any]]]`
  */
object Interpreter {

  type S = List[Event[Any]]

  /** filterAcc for plain lists (reference `FunctionalProcessing.hs:219-222`):
    * returns (kept-in-REVERSE-order, final acc). */
  def filterAccList(f: (Any, Any) => Any, acc0: Any, p: (Any, Any) => Boolean, xs: List[Any]): (List[Any], Any) =
    xs.foldLeft((List.empty[Any], acc0)) { case ((kept, acc), v) =>
      (if (p(v, acc)) v :: kept else kept, f(acc, v))
    }

  def streamFilter(p: Any => Boolean)(s: S): S =
    s.filter(e => e.value.forall(p))

  def streamMap(f: Any => Any)(s: S): S =
    s.map(e => Event(e.time, e.value.map(f)))

  def streamFilterAcc(f: (Any, Any) => Any, acc0: Any, p: (Any, Any) => Boolean)(s: S): S = {
    var acc = acc0
    s.flatMap { e =>
      e.value match {
        case Some(v) =>
          val keep = p(v, acc)
          acc = f(acc, v)
          if (keep) Some(e) else None
        case None => Some(e)
      }
    }
  }

  def streamScan(f: (Any, Any) => Any, acc0: Any)(s: S): S = {
    var acc = acc0
    s.map { e =>
      e.value match {
        case Some(v) => acc = f(acc, v); Event(e.time, Some(acc))
        case None    => Event(e.time, None)
      }
    }
  }

  def streamWindow(wm: S => List[S])(s: S): S =
    wm(s).map {
      case Nil => Event(None, Some(Nil: List[Any]))
      case w   => Event(w.head.time, Some(w.filter(_.isData).map(_.value.get)))
    }

  def streamExpand(s: S): S =
    s.flatMap { e =>
      e.value match {
        case Some(vs: Seq[_]) => vs.toList.map(v => Event(e.time, Some(v: Any)))
        case Some(other)      => List(Event(e.time, Some(other))) // non-list: pass
        case None             => List(Event(e.time, None))
      }
    }

  def streamMerge(ss: List[S]): S = ss match {
    case Nil      => Nil
    case x :: Nil => x
    case x :: xs  => merge2(x, streamMerge(xs))
  }

  /** Reference merge': timestamp merge-sort, arbitrary interleave (with the
    * reference's exact stream-swapping behavior) when untimed. Iterative —
    * the direct recursion costs one stack frame per merged event and
    * overflows on the large random streams the property tests feed this
    * ground truth. */
  private def merge2(s1: S, s2: S): S = {
    val out = List.newBuilder[Event[Any]]
    var a = s1
    var b = s2
    var done = false
    while (!done) {
      (a, b) match {
        case (xs, Nil) => out ++= xs; done = true
        case (Nil, ys) => out ++= ys; done = true
        case (e1 :: xs, e2 :: ys) =>
          (e1.time, e2.time) match {
            case (Some(t1), Some(t2)) if Event.micros(t1) >= Event.micros(t2) =>
              // e2 :: merge2(ys, s1)
              out += e2; b = a; a = ys
            case _ =>
              // e1 :: merge2(s2, xs) — timed-earlier e1, or untimed interleave
              out += e1; a = b; b = xs
          }
      }
    }
    out.result()
  }

  def streamJoin(s1: S, s2: S): S = {
    val l = s1.filter(_.isData)
    val r = s2.filter(_.isData)
    l.zip(r).map { case (a, b) => Event(a.time, Some((a.value.get, b.value.get): Any)) }
  }

  /** Evaluate the graph: `sourceStreams` feeds each Source vertex by id;
    * returns the stream arriving at each vertex's OUTPUT (sinks pass
    * through). */
  def run(g: StreamGraph, sourceStreams: Map[Int, S]): Map[Int, S] = {
    var out = Map.empty[Int, S]
    for (v <- g.topoOrder) {
      val ins: List[S] = g.predecessors(v.id).map(out).toList
      val result: S = v.op match {
        case OpSource(_) => sourceStreams.getOrElse(v.id, Nil)
        case OpSink      => ins.headOption.getOrElse(Nil)
        case OpMap       => streamMap(v.params.head.fn.asInstanceOf[Any => Any])(ins.head)
        case OpFilter(_) => streamFilter(v.params.head.fn.asInstanceOf[Any => Boolean])(ins.head)
        case OpFilterAcc(_) =>
          streamFilterAcc(
            v.params(0).fn.asInstanceOf[(Any, Any) => Any],
            v.params(1).fn,
            v.params(2).fn.asInstanceOf[(Any, Any) => Boolean])(ins.head)
        case OpScan =>
          streamScan(
            v.params(0).fn.asInstanceOf[(Any, Any) => Any],
            v.params(1).fn)(ins.head)
        case OpWindow =>
          streamWindow(v.params.head.fn.asInstanceOf[S => List[S]])(ins.head)
        case OpExpand => streamExpand(ins.head)
        case OpMerge  => streamMerge(ins)
        case OpJoin   => streamJoin(ins(0), ins(1))
      }
      out += v.id -> result
    }
    out
  }

  /** Evaluate and return the stream reaching each sink. */
  def runToSinks(g: StreamGraph, sourceStreams: Map[Int, S]): Map[Int, S] = {
    val all = run(g, sourceStreams)
    g.sinks.map(s => s.id -> all(s.id)).toMap
  }
}
