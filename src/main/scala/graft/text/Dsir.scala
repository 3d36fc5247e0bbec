package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Data Selection via Importance Resampling (DSIR) — Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS 2023:
  * score every raw document by the log importance weight
  * `log p_target(x) − log p_raw(x)` under two bag-of-hashed-n-grams models
  * (unigrams + bigrams hashed into `buckets` cells, Laplace-smoothed), so
  * a pipeline can resample its crawl toward a target domain. The paper
  * draws Gumbel-top-k from these scores; the deterministic score itself is
  * what this operator emits (sampling is one `ORDER BY score + gumbel`
  * away and belongs to the consumer's seed discipline).
  *
  * 100 TB shape: the two distribution estimates collapse to ONE
  * map-side-combined aggregate over the exploded features (`buckets` rows
  * of state — both distributions ride in the same row as conditional
  * sums), the per-bucket log-ratio table is `buckets` rows broadcast into
  * the per-document join, and the per-document score is a second hash
  * aggregate. Nothing driver-side ever exceeds the bucket count; document
  * work is linear in tokens.
  *
  * Feature hashing uses the [[PortableHash]] polynomial family, so a SQL
  * oracle replays every bucket id bit-for-bit; the only floats are the
  * per-bucket `ln` ratios and their weighted sum (engine `ln` kernels
  * agree to ~1 ulp; scores are rounded at 1e-4, eleven orders of
  * magnitude coarser). Reference corpus analog: the reference engine's
  * text pipeline has no data-selection stage — this is part of the
  * training-data tier (builder brief), like the mixture/decontamination
  * operators.
  */
object Dsir {

  /** Unigram + bigram hashed-feature stream: one row per feature
    * occurrence, `(doc_id, lang, bucket)`. */
  def features(docs: DataFrame, buckets: Int,
               widenScan: Boolean = true): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val bigrams = when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b))).otherwise(array())
    // tokenize+bigram+hash is THE per-doc hot loop: widen an
    // under-parallel scan first (no-op at real scale / on streams).
    // `widenScan = false` is for callers whose input is genuinely small
    // or already parallel — but measure before using it: at 26× data the
    // chunk-replay micro-batches arrive as ONE partition each, and
    // scoring them unwidened read 71.9 s vs 10.0 s widened (the exchange
    // costs ~1 s per gate at toy scale — cheap insurance).
    val src = if (widenScan) graft.core.Scans.widen(docs) else docs
    src.select(col("doc_id"), col("lang"),
        explode(concat(toks, bigrams)).as("f"))
      .select(col("doc_id"), col("lang"),
        pmod(PortableHash.polyHash(col("f")), lit(buckets.toLong)).as("bucket"))
  }

  /** The fitted model: per-bucket log importance ratios
    * `ln p_target(b) − ln p_raw(b)` (Laplace-smoothed), `buckets` rows —
    * the whole trained state of DSIR, small enough to broadcast (or to
    * publish as the static side of a streaming scorer). */
  def model(docs: DataFrame, targetLang: String, buckets: Int): DataFrame =
    modelFromFeatures(features(docs, buckets), targetLang, buckets)

  /** [[model]] fitted from an already-materialized [[features]] table —
    * the entry point for a caller who persisted the explode once (see
    * [[scoresPersisted]]). */
  def modelFromFeatures(feats: DataFrame, targetLang: String, buckets: Int): DataFrame =
    lamTable(
      feats.groupBy(col("bucket")).agg(
        count(lit(1)).as("cr"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("ct")),
      buckets)

  /** λ from a (bucket, cr, ct) stats table. Corpus totals come from a
    * global window over the bucket table (`buckets` rows — an aggregate
    * read-back, not the corpus), so no cross-join / nested-loop node
    * enters the plan. */
  private def lamTable(stats: DataFrame, buckets: Int): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    stats
      .withColumn("nr", sum(col("cr")).over(all))
      .withColumn("nt", sum(col("ct")).over(all))
      .select(col("bucket"),
        (log((col("ct") + 1).cast("double") / (col("nt") + buckets)) -
         log((col("cr") + 1).cast("double") / (col("nr") + buckets))).as("lam"))
  }

  /** Score `docs` against a fitted [[model]] table: per-doc Σ n_b·λ_b.
    * Output: (doc_id, n_feats, score) for EVERY input document
    * (feature-less documents score 0). Per-doc scores depend only on the
    * document's own features and the model, so scoring distributes
    * trivially — including over streaming micro-batches against a static
    * model. */
  def scoreAgainst(docs: DataFrame, lam: DataFrame, buckets: Int,
                   widenScan: Boolean = true): DataFrame =
    scoreFeaturesAgainst(docs, features(docs, buckets, widenScan), lam)

  /** [[scoreAgainst]] from an already-materialized [[features]] table of
    * the same `docs` (the persisted-explode path of [[scoresPersisted]]). */
  def scoreFeaturesAgainst(docs: DataFrame, feats: DataFrame, lam: DataFrame): DataFrame = {
    val perDoc = feats
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("n"))
      .join(broadcast(lam), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_feats"), sum(col("n") * col("lam")).as("raw"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(graft.operators.Relational.roundp(col("raw"), 4), lit(0.0)).as("score"))
  }

  /** Per-document DSIR scores against the `targetLang` documents as the
    * target distribution and the whole corpus as the raw distribution.
    *
    * The model-fit and per-doc branches each explode the corpus (Spark
    * does not CSE across plan branches). Materializing the shared
    * (doc, lang, bucket) counts once via localCheckpoint was TRIED and
    * REVERTED: at sf0.1 the eager materialization costs 2.15 s where the
    * lazy double-explode costs 0.24 s (the q_pagerank/q_chisq persist
    * counter-result again — recompute beats materialization for cheap
    * branches at this scale). MEASURED CROSSOVER STATUS (r15): recompute
    * still wins at 26× (20.5 s vs 28.3 s) AND at 100× data on 32 cores
    * (24.6 s vs 28.9 s, SCALE100_r15, runs=3) — the PolyHash48-kernel'd
    * recompute is cheaper than shuffling+spilling the exploded features
    * at every scale measured so far. Persisting `features(docs, buckets)`
    * into [[modelFromFeatures]] + [[scoreFeaturesAgainst]] (=
    * [[scoresPersisted]]) becomes the right call only when the per-token
    * feature pass is expensive relative to storage bandwidth (a real
    * tokenizer, remote shuffle service, or reuse of the features across
    * MANY queries) — not on the evidence so far for this corpus's
    * hash-cheap features. */
  def scores(docs: DataFrame, targetLang: String, buckets: Int): DataFrame =
    scoreAgainst(docs, model(docs, targetLang, buckets), buckets)

  /** [[scores]] with the corpus explode materialized ONCE: `features`
    * is persisted (memory-and-disk) and feeds both the model fit and the
    * per-doc counts, so the tokenize+hash+explode pass — the dominant
    * cost at corpus scale — runs once instead of twice. Identical output
    * to [[scores]] (same closures over the same rows; the persist is
    * physical only). The cache node lives until the session drops it
    * (`spark.catalog.clearCache()` or `feats.unpersist()` by a caller
    * holding its own reference); a long-lived service should manage the
    * features lifetime itself via the [[features]] /
    * [[modelFromFeatures]] / [[scoreFeaturesAgainst]] building blocks. */
  def scoresPersisted(docs: DataFrame, targetLang: String, buckets: Int): DataFrame = {
    val feats = features(docs, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scoreFeaturesAgainst(docs, feats, modelFromFeatures(feats, targetLang, buckets))
  }
}
