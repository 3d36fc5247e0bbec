package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed batch perceptron — the FOURTH training loop fully under the
  * oracle (after trained BPE, Lloyd k-means, and the PCA power iteration):
  * per epoch the weight update is `w ← w + Σᵢ misclassified yᵢ·xᵢ`
  * (Rosenblatt's rule applied once per full pass — "batch perceptron"),
  * which is ONE filtered integer aggregate over the corpus. Everything is
  * integer arithmetic — features are counts, labels ±1, weights integer
  * sums — so the trajectory has NO floating-point accumulation order to
  * diverge: the DuckDB oracle replays every epoch as unrolled CTEs and
  * must match weight-for-weight, margin-for-margin.
  *
  * Scale shape: each epoch is one scan + one map-side-combined aggregate
  * shuffling d partial sums per partition (the same shape as the Lloyd
  * step); driver state is d longs. Epochs are the only sequential axis —
  * exactly how full-batch training on 100 TB runs. The hashed-feature
  * inference twin is `q_quality_classifier`; this operator supplies the
  * training side with a deliberately tiny, portable feature map. */
object Perceptron {

  /** Feature column names: bias + 4 integer text statistics. */
  val featureCols: Seq[String] = (0 until 5).map(i => s"x$i")

  /** Integer features per document — each expression has a DuckDB mirror
    * in the q_perceptron oracle (code-point length, `[a-z]+` token count,
    * {'the','a'} stopword count, space count) and a ±1 label from `lang`. */
  def features(docs: DataFrame): DataFrame = {
    val toks = expr("regexp_extract_all(text, '[a-z]+', 0)")
    // the regex extraction is per-doc CPU-bound: widen an under-parallel
    // scan first (no-op at real scale)
    graft.core.Scans.widen(docs).select(
      col("doc_id"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
      lit(1L).as("x0"),
      length(col("text")).cast("bigint").as("x1"),
      size(toks).cast("bigint").as("x2"),
      size(filter(toks, w => w === "the" || w === "a")).cast("bigint").as("x3"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")))
        .cast("bigint").as("x4"))
  }

  /** The margin `w·x` as a column — bigint products, summed left-to-right
    * (order is irrelevant here: integer addition is associative). */
  def margin(w: Array[Long]): Column =
    featureCols.zipWithIndex.map { case (c, i) => col(c) * lit(w(i)) }
      .reduceLeft(_ + _)

  /** `epochs` full-batch passes from w = 0. A row is misclassified when
    * `y·(w·x) <= 0` (ties count as errors — the convention that makes
    * epoch 1 from the zero vector update on EVERY row). */
  def train(feats: DataFrame, epochs: Int): Array[Long] = {
    require(epochs >= 0)
    var w = Array.fill(featureCols.length)(0L)
    for (_ <- 0 until epochs) {
      val upd = feats.filter(col("y") * margin(w) <= 0)
        .agg(sum(col("y") * col("x0")).as("d0"),
          featureCols.toIndexedSeq.tail.zipWithIndex.map { case (c, i) =>
            sum(col("y") * col(c)).as(s"d${i + 1}") }: _*)
        .collect()(0)
      w = w.indices.map(i => w(i) + (if (upd.isNullAt(i)) 0L else upd.getLong(i))).toArray
    }
    w
  }
}
