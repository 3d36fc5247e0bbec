package graft.plans

/** The reference's 22-rule logical optimiser re-expressed over our IR
  * (`src/Striot/LogicalOptimiser.hs`). Rules are
  * `StreamGraph => Option[StreamGraph]`, fired at the first matching
  * adjacent operator pair (reference `firstMatch`), and enumerated into a
  * depth-bounded variant tree with provenance (`applyRules`,
  * `LogicalOptimiser.hs:106-119`) — a Cascades-style explore-and-cost
  * search rather than Catalyst's fixed-point rewriting. Cost-annotation
  * bookkeeping is preserved: filter selectivities multiply on fusion and
  * service rates combine via `sumRates` (`LogicalOptimiser.hs:947-948`).
  *
  * Catalyst overlap (SURVEY §4.2): filterFuse/mapFilter/mapFuse/mergeFilter/
  * filterMerge/mergeFuse/mapMerge have built-in Catalyst equivalents after
  * lowering; the stateful fusions (filterAcc/scan) and expand/window
  * interactions are the rules that add value at this IR level.
  */
object Rules {

  /** `sumRates a f b = 1/((1/a)+(f/b))` — service rate of two fused
    * operators where a fraction f of the first's output reaches the
    * second. */
  def sumRates(a: Double, f: Double, b: Double): Double = 1.0 / ((1.0 / a) + (f / b))

  // -- param-composition helpers (cast at the calling convention boundary) --
  private def p1[A](p: Param) = p.fn.asInstanceOf[Any => A]
  private def p2[A](p: Param) = p.fn.asInstanceOf[(Any, Any) => A]
  private def asList(x: Any): List[Any] = x.asInstanceOf[Seq[Any]].toList

  type Rule = StreamGraph => Option[StreamGraph]
  final case class LabelledRule(label: String, rule: Rule)

  /** Fire `r` at the first matching adjacent pair, in deterministic
    * (sorted-edge) order. */
  private def onEdge(r: (StreamGraph, StreamVertex, StreamVertex) => Option[StreamGraph]): Rule =
    g => g.edgeList.iterator.map { case (a, b) => r(g, a, b) }.collectFirst { case Some(x) => x }

  // -- pure rules ------------------------------------------------------------

  /** filter p ∘ filter q → filter (p∧q); selectivities multiply.
    * Reference `LogicalOptimiser.hs:166-175`. */
  val filterFuse: Rule = onEdge { (g, a, b) =>
    (a.op, b.op) match {
      case (OpFilter(s1), OpFilter(s2)) =>
        val p = a.params.head; val q = b.params.head
        val fused = Param(s"(x => ${p.src}(x) && ${q.src}(x))",
          (x: Any) => p1[Boolean](p)(x) && p1[Boolean](q)(x))
        val c = a.copy(op = OpFilter(s1 * s2), params = List(fused),
          serviceRate = sumRates(a.serviceRate, s1, b.serviceRate))
        Some(g.mergeVertices(v => v.id == a.id || v.id == b.id, c).removeEdge(c.id, c.id))
      case _ => None
    }
  }

  /** map f ∘ filter p → filter (p∘f) ∘ map f (predicate pushdown through
    * projection). Reference `:199-207`. */
  val mapFilter: Rule = onEdge { (g, m, f1) =>
    (m.op, f1.op) match {
      case (OpMap, OpFilter(sel)) =>
        val f = m.params.head; val p = f1.params.head
        val pushed = Param(s"(x => ${p.src}(${f.src}(x)))",
          (x: Any) => p1[Boolean](p)(p1[Any](f)(x)))
        val f2 = StreamVertex(m.id, OpFilter(sel), List(pushed), m.inType, m.inType,
          m.serviceRate + f1.serviceRate)
        val m2 = m.copy(id = f1.id)
        Some(g.replaceVertex(m, f2).replaceVertex(f1, m2))
      case _ => None
    }
  }

  /** filter ∘ filterAcc → one filterAcc with guarded acc update.
    * Reference `:244-252`. */
  val filterFilterAcc: Rule = onEdge { (g, v1, v2) =>
    (v1.op, v2.op) match {
      case (OpFilter(s1), OpFilterAcc(s2)) =>
        val p = v1.params.head
        val List(f, a, q) = v2.params.take(3)
        val accfn = Param(s"((acc, v) => if (${p.src}(v)) ${f.src}(acc, v) else acc)",
          (acc: Any, v: Any) => if (p1[Boolean](p)(v)) p2[Any](f)(acc, v) else acc)
        val pred = Param(s"((v, acc) => ${p.src}(v) && ${q.src}(v, acc))",
          (v: Any, acc: Any) => p1[Boolean](p)(v) && p2[Boolean](q)(v, acc))
        val v3 = StreamVertex(v1.id, OpFilterAcc(s1 * s2), List(accfn, a, pred),
          v1.inType, v1.inType, sumRates(v1.serviceRate, s1, v2.serviceRate))
        Some(g.mergeVertices(v => v.id == v1.id || v.id == v2.id, v3).removeEdge(v3.id, v3.id))
      case _ => None
    }
  }

  /** filterAcc ∘ filter → one filterAcc with conjoined predicate.
    * Reference `:284-290`. */
  val filterAccFilter: Rule = onEdge { (g, v1, v2) =>
    (v1.op, v2.op) match {
      case (OpFilterAcc(s1), OpFilter(s2)) =>
        val List(f, a, p) = v1.params.take(3)
        val q = v2.params.head
        val pred = Param(s"((v, acc) => ${p.src}(v, acc) && ${q.src}(v))",
          (v: Any, acc: Any) => p2[Boolean](p)(v, acc) && p1[Boolean](q)(v))
        val nv = StreamVertex(v1.id, OpFilterAcc(s1 * s2), List(f, a, pred),
          v1.inType, v1.inType, sumRates(v1.serviceRate, s1, v2.serviceRate))
        Some(g.mergeVertices(v => v.id == v1.id || v.id == v2.id, nv).removeEdge(nv.id, nv.id))
      case _ => None
    }
  }

  /** two filterAccs → one with paired accumulators. Reference `:321-329`. */
  val filterAccFilterAcc: Rule = onEdge { (g, v1, v2) =>
    (v1.op, v2.op) match {
      case (OpFilterAcc(s1), OpFilterAcc(s2)) =>
        val List(f, a, p) = v1.params.take(3)
        val List(fg, b, q) = v2.params.take(3)
        val accfn = Param(
          s"((ab, v) => (${f.src}(ab._1, v), if (${p.src}(v, ab._1)) ${fg.src}(ab._2, v) else ab._2))",
          (ab: Any, v: Any) => {
            val (x, y) = ab.asInstanceOf[(Any, Any)]
            (p2[Any](f)(x, v), if (p2[Boolean](p)(v, x)) p2[Any](fg)(y, v) else y): Any
          })
        val init = Param(s"(${a.src}, ${b.src})", (a.fn, b.fn): Any)
        val pred = Param(s"((v, yz) => ${p.src}(v, yz._1) && ${q.src}(v, yz._2))",
          (v: Any, yz: Any) => {
            val (y, z) = yz.asInstanceOf[(Any, Any)]
            p2[Boolean](p)(v, y) && p2[Boolean](q)(v, z)
          })
        val nv = StreamVertex(v1.id, OpFilterAcc(s1 * s2),
          List(accfn, init, pred) ++ v1.params.drop(3),
          v1.inType, v1.inType, sumRates(v1.serviceRate, s1, v2.serviceRate))
        Some(g.mergeVertices(v => v.id == v1.id || v.id == v2.id, nv).removeEdge(nv.id, nv.id))
      case _ => None
    }
  }

  /** map f ∘ map g → map (f⨟g). Reference `:368-373`. */
  val mapFuse: Rule = onEdge { (g, v1, v2) =>
    (v1.op, v2.op) match {
      case (OpMap, OpMap) =>
        val f = v1.params.head; val h = v2.params.head
        val fused = Param(s"(x => ${h.src}(${f.src}(x)))",
          (x: Any) => p1[Any](h)(p1[Any](f)(x)))
        val nv = StreamVertex(v1.id, OpMap, fused :: v1.params.drop(1),
          v1.inType, v2.outType, sumRates(v1.serviceRate, 1, v2.serviceRate))
        Some(g.mergeVertices(v => v.id == v1.id || v.id == v2.id, nv).removeEdge(nv.id, nv.id))
      case _ => None
    }
  }

  /** map f ∘ scan g a → scan ((acc,v) => g(acc, f(v))) a. Reference `:391-396`. */
  val mapScan: Rule = onEdge { (g, v1, v2) =>
    (v1.op, v2.op) match {
      case (OpMap, OpScan) =>
        val f = v1.params.head
        val sf = v2.params(0); val a = v2.params(1)
        val fused = Param(s"((acc, v) => ${sf.src}(acc, ${f.src}(v)))",
          (acc: Any, v: Any) => p2[Any](sf)(acc, p1[Any](f)(v)))
        val nv = StreamVertex(v1.id, OpScan, List(fused, a),
          v1.inType, v2.outType, sumRates(v1.serviceRate, 1, v2.serviceRate))
        Some(g.mergeVertices(v => v.id == v1.id || v.id == v2.id, nv).removeEdge(nv.id, nv.id))
      case _ => None
    }
  }

  /** expand ∘ filter p → map (filter p) ∘ expand (push the filter inside the
    * arrays, before Generate). Selectivity info is lost. Reference `:425-431`. */
  val expandFilter: Rule = onEdge { (g, e, f) =>
    (e.op, f.op) match {
      case (OpExpand, OpFilter(_)) =>
        val p = f.params.head
        val m = StreamVertex(e.id, OpMap,
          List(Param(s"(xs => xs.filter(${p.src}))",
            (xs: Any) => asList(xs).filter(p1[Boolean](p)): Any)),
          e.inType, e.inType, f.serviceRate)
        val e2 = StreamVertex(f.id, OpExpand, Nil, e.inType, e.outType, e.serviceRate)
        Some(g.replaceVertex(e, m).replaceVertex(f, e2))
      case _ => None
    }
  }

  /** map f ∘ filterAcc g a p → filterAcc g a (p∘f) ∘ map f. Reference `:455-463`.
    *
    * CAVEAT (found by our soundness tests; the reference applies this rule
    * unconditionally): on the left the accumulator is built from MAPPED
    * values, on the right from RAW values — the rewrite is only
    * semantics-preserving when the accumulator update is insensitive to
    * that difference (e.g. counting, or any `g` with `g(acc, f(v)) ≡
    * g(acc, v)` under `p`). We mirror the reference's behavior for parity. */
  val mapFilterAcc: Rule = onEdge { (g, m, f1) =>
    (m.op, f1.op) match {
      case (OpMap, OpFilterAcc(sel)) =>
        val f = m.params.head
        val List(fg, a, p) = f1.params.take(3)
        val pred = Param(s"((v, acc) => ${p.src}(${f.src}(v), acc))",
          (v: Any, acc: Any) => p2[Boolean](p)(p1[Any](f)(v), acc))
        val f2 = StreamVertex(m.id, OpFilterAcc(sel), List(fg, a, pred),
          m.inType, m.inType, sumRates(m.serviceRate, 1, f1.serviceRate))
        val m2 = m.copy(id = f1.id)
        Some(g.replaceVertex(m, f2).replaceVertex(f1, m2))
      case _ => None
    }
  }

  /** Could two type strings plug together? (reference `compatibleTypes`,
    * `:495-506` — type variables unify with anything). */
  def compatibleTypes(outT: String, inT: String): Boolean =
    outT == inT || inT.headOption.exists(_.isLower) || outT.headOption.exists(_.isLower)

  /** map f ∘ window w → window w ∘ map (map f), when types allow.
    * Reference `:508-519`. */
  val mapWindow: Rule = onEdge { (g, m, w) =>
    (m.op, w.op) match {
      case (OpMap, OpWindow) if compatibleTypes(m.inType, w.inType) =>
        val f = m.params.head
        val w2 = StreamVertex(m.id, OpWindow, w.params, w.inType, w.outType, w.serviceRate)
        val m2 = StreamVertex(w.id, OpMap,
          List(Param(s"(xs => xs.map(${f.src}))", (xs: Any) => asList(xs).map(p1[Any](f)): Any)),
          s"[${m.inType}]", s"[${m.outType}]", m.serviceRate)
        Some(g.replaceVertex(m, w2).replaceVertex(w, m2))
      case _ => None
    }
  }

  /** expand ∘ map f → map (map f) ∘ expand. Reference `:604-612`. */
  val expandMap: Rule = onEdge { (g, e, m) =>
    (e.op, m.op) match {
      case (OpExpand, OpMap) =>
        val f = m.params.head
        val t5 = s"[${m.outType}]"
        val m2 = StreamVertex(e.id, OpMap,
          List(Param(s"(xs => xs.map(${f.src}))", (xs: Any) => asList(xs).map(p1[Any](f)): Any)),
          e.inType, t5, m.serviceRate)
        val e2 = StreamVertex(m.id, OpExpand, Nil, t5, m.outType, e.serviceRate)
        Some(g.replaceVertex(e, m2).replaceVertex(m, e2))
      case _ => None
    }
  }

  /** expand ∘ scan f a → filter(nonEmpty) ∘ scan(list-scanl) ∘ expand.
    * Reference `:638-653` (new filter: sel 0.5, service 0 — reference's own
    * stated estimates). */
  val expandScan: Rule = onEdge { (g, e, sc) =>
    (e.op, sc.op) match {
      case (OpExpand, OpScan) =>
        val List(f, a) = sc.params.take(2)
        val t4 = s"[${sc.outType}]"
        val k = g.newVertexId
        val scanList = Param(
          s"((b, xs) => scanlTail(${f.src}, b.last, xs))",
          (b: Any, xs: Any) => {
            var acc = asList(b).last
            asList(xs).map { x => acc = p2[Any](f)(acc, x); acc }: Any
          })
        val fv = StreamVertex(e.id, OpFilter(0.5),
          List(Param("(xs => xs.nonEmpty)", (xs: Any) => asList(xs).nonEmpty)),
          e.inType, e.inType, 0)
        val scv = StreamVertex(sc.id, OpScan,
          List(scanList, Param(s"List(${a.src})", List(a.fn): Any)),
          e.inType, t4, sc.serviceRate)
        val ev = StreamVertex(k, OpExpand, Nil, t4, sc.outType, e.serviceRate)
        Some(g.replaceVertex(sc, ev).replaceVertex(e, fv).removeEdge(fv.id, ev.id)
          .overlay(StreamGraph.path(Seq(fv, scv, ev))))
      case _ => None
    }
  }

  /** expand ∘ expand → map concat ∘ expand. Reference `:684-690`. */
  val expandExpand: Rule = onEdge { (g, e1, e2) =>
    (e1.op, e2.op) match {
      case (OpExpand, OpExpand) =>
        val m = StreamVertex(e1.id, OpMap,
          List(Param("(xss => xss.flatten)",
            (xss: Any) => asList(xss).flatMap(asList): Any)),
          e1.inType, e1.outType, e1.serviceRate)
        Some(g.replaceVertex(e1, m))
      case _ => None
    }
  }

  /** expand ∘ filterAcc → scan(filterAcc) ∘ map(reverse∘fst) ∘ expand.
    * Reference `:903-920`. */
  val expandFilterAcc: Rule = onEdge { (g, e, fa) =>
    (e.op, fa.op) match {
      case (OpExpand, OpFilterAcc(_)) =>
        val List(f, a, p) = fa.params.take(3)
        val scanFn = Param(
          s"((st, xs) => filterAcc(${f.src}, st._2, ${p.src}, xs))",
          (st: Any, xs: Any) => {
            val (_, acc) = st.asInstanceOf[(Any, Any)]
            Interpreter.filterAccList(p2[Any](f), acc, p2[Boolean](p), asList(xs)): Any
          })
        val scanInit = Param(s"(Nil, ${a.src})", (List.empty[Any], a.fn): Any)
        val scan = StreamVertex(e.id, OpScan, List(scanFn, scanInit),
          e.inType, e.inType, fa.serviceRate)
        val mapr = StreamVertex(fa.id, OpMap,
          List(Param("(st => st._1.reverse)",
            (st: Any) => asList(st.asInstanceOf[(Any, Any)]._1).reverse: Any)),
          e.inType, e.inType, 0)
        val k = g.newVertexId
        val expd = e.copy(id = k)
        Some(g.removeEdge(e.id, fa.id).replaceVertex(e, scan).replaceVertex(fa, expd)
          .overlay(StreamGraph.path(Seq(scan, mapr, expd))))
      case _ => None
    }
  }

  // -- merge interaction rules ----------------------------------------------

  /** "Hoist" an operator upstream through a Merge: op(merge(ss)) →
    * merge(op(s) for s in ss). Reference `hoistOp`, `:717-742`. */
  private def hoistOp(opName: String): Rule = onEdge { (g, m, f) =>
    (m.op, f.op) match {
      case (OpMerge, o) if o.name == opName =>
        val inbound = g.predecessors(m.id)
        var g2 = g.removeEdge(m.id, f.id).replaceVertex(f, m)
        // snip inbound edges, then insert a copy of the op on each branch
        for (v <- inbound) g2 = g2.removeEdge(v, m.id)
        for (v <- inbound) {
          val op = StreamVertex(g2.newVertexId, f.op, f.params, m.inType, f.outType, f.serviceRate)
          g2 = g2.addVertex(op).copy(edges = g2.edges ++ Vector((v, op.id), (op.id, m.id)))
          g2 = StreamGraph(g2.vertices, g2.edges.distinct)
        }
        val m2 = g2.byId(m.id).copy(inType = f.outType, outType = f.outType)
        Some(g2.replaceVertex(g2.byId(m.id), m2))
      case _ => None
    }
  }

  /** filter p (merge ss) → merge (filter p s). Reference `:712-758`. */
  val mergeFilter: Rule = hoistOp("Filter")
  /** expand (merge ss) → merge (expand s). Reference `:763-780`. */
  val mergeExpand: Rule = hoistOp("Expand")
  /** map f (merge ss) → merge (map f s). Reference `:814-838`. */
  val mergeMap: Rule = hoistOp("Map")

  /** "Push" identical operators on every Merge input downstream through it:
    * merge(op(s) for s) → op(merge(ss)). Fires only when all inbound
    * operators and parameters are identical. Reference `pushOp`, `:806-845`. */
  private def pushOp(opName: String): Rule = onEdge { (g, ma, me) =>
    (ma.op, me.op) match {
      case (o, OpMerge) if o.name == opName =>
        val inboundIds = g.predecessors(me.id)
        val inbound = inboundIds.map(g.byId)
        val identicalOps = inbound.map(_.op).distinct.length == 1
        val identicalParams = inbound.map(_.params).distinct.length == 1
        if (!(identicalOps && identicalParams && inbound.forall(_.op.name == opName))) None
        else g.successors(me.id).headOption.map { on =>
          val me2 = me.copy(inType = ma.inType, outType = ma.inType)
          val ma2 = ma.copy(id = g.newVertexId)
          var g2 = g.removeEdge(me.id, on)
            .mergeVertices(v => inboundIds.contains(v.id), me)
          g2 = g2.replaceVertex(g2.byId(me.id), me2).removeEdge(me2.id, me2.id)
          g2.addVertex(ma2).copy(edges =
            (g2.edges ++ Vector((me2.id, ma2.id), (ma2.id, on))).distinct)
        }
      case _ => None
    }
  }

  /** merge[map f s…] → map f (merge […]). Reference `:839-845`. */
  val mapMerge: Rule = pushOp("Map")
  /** merge[filter p s…] → filter p (merge […]). Reference `:852-858`. */
  val filterMerge: Rule = pushOp("Filter")
  /** merge[expand s…] → expand (merge […]). Reference `:863-869`. */
  val expandMerge: Rule = pushOp("Expand")

  /** merge ∘ merge → one merge. Reference `:876-881`. */
  val mergeFuse: Rule = onEdge { (g, m1, m2) =>
    (m1.op, m2.op) match {
      case (OpMerge, OpMerge) =>
        Some(g.mergeVertices(v => v.id == m1.id || v.id == m2.id, m1).removeEdge(m1.id, m1.id))
      case _ => None
    }
  }

  // -- reshaping rules (change window contents; OFF by default) -------------

  /** filter p ∘ window w → window w ∘ map (filter p). Invalid if the
    * WindowMaker inspects values/sequencing. Reference `:983-990`. */
  val filterWindow: Rule = onEdge { (g, f, w) =>
    (f.op, w.op) match {
      case (OpFilter(_), OpWindow) =>
        val p = f.params.head
        val m = StreamVertex(w.id, OpMap,
          List(Param(s"(xs => xs.filter(${p.src}))",
            (xs: Any) => asList(xs).filter(p1[Boolean](p)): Any)),
          w.outType, w.outType, f.serviceRate)
        val w2 = w.copy(id = f.id)
        Some(g.replaceVertex(w, m).replaceVertex(f, w2))
      case _ => None
    }
  }

  /** filterAcc ∘ window → window ∘ scan(filterAcc) ∘ map(reverse∘fst).
    * Reference `:1014-1029`. */
  val filterAccWindow: Rule = onEdge { (g, fa, w) =>
    (fa.op, w.op) match {
      case (OpFilterAcc(_), OpWindow) =>
        val List(f, a, p) = fa.params.take(3)
        val w2 = w.copy(id = fa.id)
        val scanFn = Param(
          s"((st, xs) => filterAcc(${f.src}, st._2, ${p.src}, xs))",
          (st: Any, xs: Any) => {
            val (_, acc) = st.asInstanceOf[(Any, Any)]
            Interpreter.filterAccList(p2[Any](f), acc, p2[Boolean](p), asList(xs)): Any
          })
        val sc = StreamVertex(w.id, OpScan,
          List(scanFn, Param(s"(Nil, ${a.src})", (List.empty[Any], a.fn): Any)),
          w.outType, w.outType, fa.serviceRate)
        val m = StreamVertex(g.newVertexId, OpMap,
          List(Param("(st => st._1.reverse)",
            (st: Any) => asList(st.asInstanceOf[(Any, Any)]._1).reverse: Any)),
          w.outType, w.outType, 0)
        Some(g.replaceVertex(fa, w2).replaceVertex(w, m).removeEdge(w2.id, m.id)
          .overlay(StreamGraph.path(Seq(w2, sc, m))))
      case _ => None
    }
  }

  // -- rule sets (reference `pureRules`/`reorderingRules`/`reshapingRules`,
  // `LogicalOptimiser.hs:124-162`) ------------------------------------------

  val pureRules: List[LabelledRule] = List(
    LabelledRule("filterFuse", filterFuse),
    LabelledRule("mapFilter", mapFilter),
    LabelledRule("filterFilterAcc", filterFilterAcc),
    LabelledRule("filterAccFilter", filterAccFilter),
    LabelledRule("filterAccFilterAcc", filterAccFilterAcc),
    LabelledRule("mapFuse", mapFuse),
    LabelledRule("mapScan", mapScan),
    LabelledRule("expandFilter", expandFilter),
    LabelledRule("mapWindow", mapWindow),
    LabelledRule("expandMap", expandMap),
    LabelledRule("expandScan", expandScan),
    LabelledRule("expandExpand", expandExpand),
    LabelledRule("mergeMap", mergeMap),
    LabelledRule("mapMerge", mapMerge),
    LabelledRule("expandFilterAcc", expandFilterAcc))

  val reorderingRules: List[LabelledRule] = List(
    LabelledRule("filterMerge", filterMerge),
    LabelledRule("expandMerge", expandMerge),
    LabelledRule("mergeFilter", mergeFilter),
    LabelledRule("mergeExpand", mergeExpand),
    LabelledRule("mergeFuse", mergeFuse))

  val reshapingRules: List[LabelledRule] = List(
    LabelledRule("filterWindow", filterWindow),
    LabelledRule("filterAccWindow", filterAccWindow))

  /** mapFilterAcc is NOT semantics-preserving when the accumulator update
    * is value-sensitive (see the rule's caveat) — like the reshaping rules,
    * it is kept OUT of [[defaultRules]] so [[Planner.bestPlan]] cannot
    * silently pick a result-changing variant. [[referenceParityRules]]
    * includes it, matching the reference's (unconditional) rule set for
    * comparison tests. */
  val conditionalRules: List[LabelledRule] = List(
    LabelledRule("mapFilterAcc", mapFilterAcc))

  val defaultRules: List[LabelledRule] = pureRules ++ reorderingRules

  /** The reference's `defaultRewriteRules` surface: includes mapFilterAcc
    * unconditionally, as `LogicalOptimiser.hs:124-152` does. */
  val referenceParityRules: List[LabelledRule] =
    pureRules ++ conditionalRules ++ reorderingRules

  // -- variant enumeration ---------------------------------------------------

  /** A rewrite variant with provenance (reference `Variant`,
    * `LogicalOptimiser.hs:64-80`). */
  final case class Variant(graph: StreamGraph, rule: String, parent: Option[Variant]) {
    def sequence: List[String] =
      parent.map(_.sequence).getOrElse(Nil) ++ (if (rule.isEmpty) Nil else List(rule))
  }
  object Variant {
    def original(g: StreamGraph): Variant = Variant(g, "", None)
  }

  /** Enumerate the tree of all rule applications to the given depth,
    * collecting every intermediate variant (reference `applyRules`,
    * `LogicalOptimiser.hs:106-119`). Callers may dedupe by graph. */
  def applyRules(rules: List[LabelledRule], depth: Int, v: Variant): List[Variant] =
    if (depth < 1) List(v)
    else {
      val children = rules.flatMap(lr => lr.rule(v.graph).map(g2 => Variant(g2, lr.label, Some(v))))
      v :: children ::: children.flatMap(applyRules(rules, depth - 1, _))
    }

  /** `rewriteGraph`: depth-5 enumeration from an original graph
    * (reference `LogicalOptimiser.hs:118-119`). */
  def rewriteGraph(rules: List[LabelledRule], g: StreamGraph, depth: Int = 5): List[Variant] =
    applyRules(rules, depth, Variant.original(g))
}
