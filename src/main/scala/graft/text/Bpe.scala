package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained byte-pair encoding (Sennrich et al., ACL 2016 — "Neural Machine
  * Translation of Rare Words with Subword Units"): learn a ranked merge
  * table from corpus word frequencies, then tokenize by replaying the
  * merges. The reference has no tokenizer; this is part of the
  * LLM-data-pipeline surface ([[TextAnalysis.bpeishTokenCount]] counts
  * PRE-tokenizer pieces; this learns actual merges).
  *
  * 100 TB shape: training never touches the corpus row-by-row more than
  * once — the corpus collapses to a (word, freq) table in one map-side-
  * combined aggregate (the standard BPE trainer input; every production
  * tokenizer trains from exactly this), and the iterations run over that
  * vocab-sized table. Application is vocab-sized too: tokenize each
  * DISTINCT word once, then broadcast-join the per-word token counts back
  * to the corpus — the per-word loop never runs on the 100 TB side.
  *
  * Determinism contract (mirrored verbatim by the DuckDB oracle CTEs in
  * `TextQueries`): pair counts are adjacent-position counts (overlaps
  * included); the winning pair per iteration is max by
  * (count DESC, left ASC, right ASC); application is greedy left-to-right —
  * a symbol merges with the previous output symbol iff that symbol equals
  * `left` as a STRING (so a just-merged symbol never chains into the same
  * merge within one pass).
  */
object Bpe {

  /** One learned merge, in training order (rank = position in the list). */
  final case class Merge(left: String, right: String)

  /** Greedy left-to-right single-merge application — the exact lambda the
    * oracle's `list_reduce` replays. */
  def applyMerge(syms: IndexedSeq[String], l: String, r: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = out.last + s
      else out += s
      i += 1
    }
    out.toIndexedSeq
  }

  /** Replay a full merge table over a word (chars → post-training symbols). */
  def tokenize(word: String, merges: Seq[Merge]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = word.map(_.toString)
    merges.foreach(m => syms = applyMerge(syms, m.left, m.right))
    syms
  }

  /** Exact local trainer over a collected (word, freq) vocab. Stops early
    * if the vocab runs out of adjacent pairs. */
  def trainLocal(vocab: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var words: Array[(IndexedSeq[String], Long)] =
      vocab.iterator.filter(_._1.nonEmpty)
        .map { case (w, f) => (w.map(_.toString): IndexedSeq[String], f) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var k = 0
    while (k < nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) k = nMerges
      else {
        val ((l, r), _) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += Merge(l, r)
        words = words.map { case (syms, f) => (applyMerge(syms, l, r), f) }
        k += 1
      }
    }
    merges.toSeq
  }

  /** Distributed trainer: one shuffle per iteration over the VOCAB table
    * (explode adjacent pairs weighted by freq → sum → take the winner),
    * merge applied as a typed map. Identical output to [[trainLocal]]
    * (spec-pinned); used when the vocab exceeds the collect gate. */
  def trainDistributed(spark: SparkSession, wordFreq: DataFrame, nMerges: Int): Seq[Merge] = {
    import spark.implicits._
    var words = wordFreq.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString).toSeq, f) }
      .toDF("syms", "freq")
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var k = 0
    while (k < nMerges) {
      val best = words
        // adjacent pairs with explicit field names (arrays_zip's generated
        // names depend on the input expressions — fragile to rely on)
        .select(col("freq"), explode(expr(
          "transform(slice(syms, 1, size(syms) - 1), " +
          "(s, i) -> struct(s AS l, element_at(syms, i + 2) AS r))")).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) k = nMerges
      else {
        val (l, r) = (best.head.getString(0), best.head.getString(1))
        merges += Merge(l, r)
        words = words.as[(Seq[String], Long)]
          .map { case (syms, f) => (applyMerge(syms.toIndexedSeq, l, r).toSeq, f) }
          .toDF("syms", "freq")
        // truncate lineage: nMerges chained maps would otherwise re-run
        // every prior iteration per job
        if ((k + 1) % 4 == 0 || k + 1 == nMerges) words = words.localCheckpoint()
        k += 1
      }
    }
    merges.toSeq
  }

  /** Train from a (word, freq) DataFrame: collect-and-train-locally when the
    * vocab is small enough (the common case — BPE vocabs are bounded by
    * design), distributed iterations otherwise. Same result either way. */
  def train(spark: SparkSession, wordFreq: DataFrame, nMerges: Int,
            collectGate: Long = 2000000L): Seq[Merge] = {
    val n = wordFreq.count()
    if (n <= collectGate)
      trainLocal(wordFreq.select(col("word").cast("string"), col("freq").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq, nMerges)
    else trainDistributed(spark, wordFreq, nMerges)
  }

  /** Post-training token count per DISTINCT word: the per-word replay runs
    * once per vocab entry, never per corpus row. Returns (word, n_tok). */
  def wordTokenCounts(spark: SparkSession, words: DataFrame, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val ms = merges.toIndexedSeq
    words.select(col("word").cast("string")).as[String]
      .map(w => (w, tokenize(w, ms).length))
      .toDF("word", "n_tok")
  }
}
