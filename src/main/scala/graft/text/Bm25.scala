package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Relational.roundp

/** BM25 full-text relevance scoring — the missing "search" face of the
  * text-pipeline surface (the reference has word-extraction and frequency
  * operators, `docs/Operators.md`; ranked retrieval over them is the
  * natural analytics extension, same position as topk over freqMap).
  *
  * Okapi BM25 with Lucene's non-negative idf variant
  * (Robertson & Zaragoza, "The Probabilistic Relevance Framework: BM25 and
  * Beyond", FnTIR 2009):
  *
  *   idf(t)   = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
  *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·dl/avgdl))
  *
  * Scale shape — this is the ad-hoc-query plan, not an index build:
  * per-term tf and dl come from ONE codegen'd pass fused into the scan
  * ([[graft.functions.TermTfs]] — no explode: a Q-term query costs one
  * tokenize + one counting walk per row, not Q filter passes and not
  * |doc| shuffle rows); corpus stats (N, avgdl, per-term df) are ONE
  * map-side-combined aggregate producing ONE row, crossJoined back as a
  * broadcast (whitelisted in PlanAuditSpec — the q_tfidf pattern); the
  * final top-k is an ordered limit (TakeOrdered — no global sort, no
  * single-partition window). Two scans of the corpus total (stats +
  * score); a repeated-query deployment would persist the tokenized
  * projection or pre-build posting lists instead.
  */
object Bm25 {

  /** Top-`k` docs by BM25 score for `queryTerms`, ties broken by doc id.
    * Output: (doc_id, score) with score floor-rounded to 4dp
    * ([[roundp]]); only docs matching ≥1 term appear. Ranking happens on
    * the ROUNDED score so an engine re-deriving it (the DuckDB oracle)
    * selects the identical set at the k boundary. */
  def topK(docs: DataFrame, idCol: Column, textCol: Column,
           queryTerms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    require(queryTerms.distinct == queryTerms, s"duplicate query terms: $queryTerms")
    require(k > 0, s"k must be positive, got $k")

    // ONE tokenize + ONE counting pass per document (graft.functions
    // .TermTfs: [dl, tf_0..tf_{Q-1}] from the token array) — the former
    // composed form ran Q+1 interpreted HOF trees per row, each
    // re-splitting the text (codegen CSE does not reach across
    // interpreted lambdas; 26x measured 10.9x, the per-doc super-linear
    // signature). The kernel lands in its OWN projection and dl/tf_i
    // are element extractions of that alias in a second one:
    // CollapseProject refuses to inline a non-cheap alias referenced
    // more than once, so the array materializes exactly once per row
    // (Bm25KernelSpec pins one term_tfs instance in the optimized plan).
    val tfsArr = graft.functions.TermTfs(TextAnalysis.tokens(textCol), queryTerms)
    val base = graft.core.Scans.widen(docs)
      .select(idCol.as("doc_id"), tfsArr.as("__tfs"))
      .select(
        (col("doc_id") +: col("__tfs").getItem(0).as("dl") +:
          queryTerms.indices.map(i => col("__tfs").getItem(i + 1).as(s"tf_$i"))): _*)

    // ONE corpus-stats row. avgdl is an exact long sum divided once —
    // never avg(): engines disagree on incremental double accumulation,
    // and this number feeds every score.
    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
        queryTerms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).cast("double").as(s"df_$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)

    // left-to-right term sum, mirrored exactly in the oracle SQL (same
    // operation order → same IEEE result before the 4dp rounding)
    val score = queryTerms.indices
      .map { i =>
        val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
        val tf  = col(s"tf_$i").cast("double")
        idf * (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
      }
      .reduceLeft(_ + _)

    base.crossJoin(broadcast(stats))
      .filter(queryTerms.indices.map(i => col(s"tf_$i") > 0).reduceLeft(_ || _))
      .select(col("doc_id"), roundp(score, 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
