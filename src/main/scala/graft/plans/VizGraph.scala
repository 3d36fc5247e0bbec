package graft.plans

/** GraphViz dot export of [[StreamGraph]]s — plan provenance display,
  * mirroring the reference's `src/Striot/VizGraph.hs`:
  * `streamGraphToDot` (box nodes labelled operator + params,
  * `VizGraph.hs:42-43,130-140`), `partitionedGraphToDot` (one dashed
  * rounded cluster per deployment partition labelled "Node N",
  * `VizGraph.hs:92-117`), and `jacksonGraphToDot` (per-vertex queueing
  * annotations, `VizGraph.hs:86-88`). Rendering to PNG is left to the
  * caller's `dot` binary; this module only produces the dot text.
  */
object VizGraph {

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c    => c.toString
    }

  private def label(v: StreamVertex): String = {
    val params = v.params.map(_.src).mkString(" ")
    esc(if (params.isEmpty) v.op.name else s"${v.op.name} $params")
  }

  private def vertexLines(g: StreamGraph): Seq[String] =
    g.vertices.map(v =>
      s"""  ${v.id} [label="${label(v)}",shape=box,style=filled,fillcolor=white,fontsize=18]""")

  private def edgeLines(g: StreamGraph): Seq[String] =
    g.edges.map { case (a, b) => s"  $a -> $b [weight=10]" }

  /** Dot text for a plain stream graph (reference `streamGraphToDot`). */
  def streamGraphToDot(g: StreamGraph): String =
    (Seq("digraph {", "  bgcolor=\"white\"", "  ratio=\"compress\"") ++
      vertexLines(g) ++ edgeLines(g) :+ "}").mkString("", "\n", "\n")

  /** Dot text with one dashed-rounded cluster per partition, labelled
    * "Node N" bottom-right (reference `partitionedGraphToDot` /
    * `subGraphToPartition`). */
  def partitionedGraphToDot(g: StreamGraph, partitions: Planner.PartitionMap): String = {
    val clusters = partitions.zipWithIndex.map { case (ids, i) =>
      val n = i + 1
      s"""  subgraph cluster$n {
         |    color="#888888"
         |    style="rounded,dashed"
         |    labelloc=b
         |    labeljust=r
         |    label="Node $n"
         |    ${ids.mkString(",")}
         |  }""".stripMargin
    }
    (Seq("digraph {", "  bgcolor=\"white\"") ++ clusters ++
      vertexLines(g) ++ edgeLines(g) :+ "}").mkString("", "\n", "\n")
  }

  /** Dot text annotated with the Jackson queueing solution: arrival rate
    * and utilisation per vertex (reference `jacksonGraphToDot`). */
  def jacksonGraphToDot(g: StreamGraph): String = {
    val info = Jackson.calcAll(g).map(oi => oi.opId -> oi).toMap
    val verts = g.vertices.map { v =>
      val ann = info.get(v.id)
        .map(oi => f"\\nλ=${oi.arrRate}%.3f ρ=${oi.util}%.3f")
        .getOrElse("")
      s"""  ${v.id} [label="${label(v)}$ann",shape=box,style=filled,fillcolor=white]"""
    }
    (Seq("digraph {", "  bgcolor=\"white\"") ++ verts ++ edgeLines(g) :+ "}")
      .mkString("", "\n", "\n")
  }
}
