package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Relational.roundp
import graft.text.TextAnalysis

/** Deduplication suite for training-data pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. All formulated as shuffle-lean DataFrame plans:
  * exact dedup is one hash aggregate; the near-dup variants explode to
  * (doc, feature) pairs, prune high-frequency features (the skew guard —
  * a feature shared by k docs produces k² candidate pairs), and bucket-join
  * so the candidate set, not the n² pair space, is materialized.
  */
object Dedup {

  /** Exact duplicate groups by content hash: one hash aggregate, map-side
    * combined; the canonical keeper is the minimum id. */
  def exactDupGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles of `text` as an array column (empty when
    * the doc has fewer than n tokens). */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Candidate near-duplicate pairs by exact n-gram Jaccard, with
    * document-frequency pruning: only shingles appearing in ≤ maxDf docs are
    * used as join keys AND as the similarity universe (so the measure is
    * Jaccard over the df-pruned shingle sets — identical on the oracle side).
    * Pruning bounds the self-join fan-out: a shingle with df=k contributes
    * k(k-1)/2 pairs, so maxDf caps per-key blow-up — the skew guard that
    * keeps this plan alive at 100 TB. Output: (id_a, id_b, n_common, n_a,
    * n_b, jaccard) for pairs with jaccard ≥ minJaccard, id_a < id_b. */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
                        n: Int, maxDf: Int, minJaccard: Double): DataFrame = {
    // persisted: feeds the document-frequency aggregate AND the prune join
    // (the shingling HOF is interpreted — evaluate it once)
    val shingled = df.select(id.as("doc_id"), explode(wordNgrams(text, n)).as("shingle")).persist()
    val rare = shingled
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("shingle")
    // The pruned (doc, shingle) set feeds the df-filter join, BOTH sides of
    // the self-join, and the per-doc sizes — persist it so the
    // explode+distinct chain runs once, not four times. (At cluster scale
    // this is the natural checkpoint of the pipeline.)
    val pruned = shingled.join(rare, "shingle").persist()
    val docSizes = pruned.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    // shingle self-join for candidate pairs: measured FASTER than
    // generating i<j combinations inside a collect_list group (nested
    // higher-order slice/transform evaluates interpreted with O(df²)
    // array copies per shingle — 2× slower end to end).
    val a = pruned.select(col("shingle"), col("doc_id").as("id_a"))
    val b = pruned.select(col("shingle"), col("doc_id").as("id_b"))
    val common = a.join(b, "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(docSizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_shingles", "n_a"), "id_a")
      .join(docSizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_shingles", "n_b"), "id_b")
      .withColumn("jaccard",
        roundp(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
  }

  /** MinHash signatures: numPerms independent permutations approximated by
    * seeded xxhash64 over the shingle set; signature k = min over shingles
    * of hash_k(shingle). One explode + one grouped aggregate (numPerms
    * codegen'd `min`s, map-side combined — the per-doc partial collapses to
    * numPerms longs before the shuffle). A per-row nested-higher-order
    * formulation was measured 16× SLOWER here: HOF lambdas evaluate
    * interpreted and re-evaluate the shingling per permutation. */
  def minhashSignatures(df: DataFrame, id: Column, text: Column,
                        n: Int, numPerms: Int): DataFrame = {
    val shingled = df.select(id.as("doc_id"), explode(wordNgrams(text, n)).as("shingle"))
    val mins = (0 until numPerms).map(k => min(xxhash64(lit(k), col("shingle"))).as(s"h$k"))
    shingled.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numPerms).map(k => col(s"h$k")): _*).as("signature"))
  }

  /** LSH banding over MinHash signatures: split the signature into bands of
    * `rowsPerBand`, hash each band, and emit candidate pairs that share at
    * least one band bucket. Two docs with Jaccard s collide in a band with
    * probability s^rowsPerBand — the standard S-curve. The band join is an
    * equi-join on (band_idx, band_hash): shuffle-partitioned, no n² scan. */
  def minhashLshCandidates(signatures: DataFrame, numPerms: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numPerms / rowsPerBand
    // Materialize signatures BEFORE banding: the banding expression
    // references the signature array numBands×rowsPerBand times, and
    // Catalyst's projection collapse would otherwise inline (and so
    // recompute) the whole minhash expression at every reference.
    val sigs = signatures.persist()
    val banded = sigs.select(
      col("doc_id"),
      posexplode(
        transform(sequence(lit(0), lit(numBands - 1)),
          b => xxhash64(concat_ws(",",
            (0 until rowsPerBand).map(r =>
              element_at(col("signature"), (b * rowsPerBand).cast("int") + r + 1)): _*), b)))
        .as(Seq("band_idx", "band_hash")))
      .persist() // used as both sides of the bucket self-join
    val l = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_a"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 64-bit SimHash over the token multiset: per token a 64-bit hash votes
    * ±1 on each bit position; the fingerprint sets bit b iff the sum of
    * votes is positive. Computed PER ROW (hash the token array once, then
    * fold per-bit votes over it) — no explode, no shuffle; a pure map over
    * the corpus scan at any scale. */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame = {
    val hashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    // dynamic bit tests via a powers-of-two literal (shiftleft/shiftright
    // only take static shifts): bit b of h ⟺ (h & 2^b) ≠ 0
    val pow2 = array((0 until 64).map(i => lit(1L << i)): _*)
    val fp = aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => {
        val mask = element_at(pow2, b.cast("int") + 1)
        val votes = aggregate(col("__hs"), lit(0),
          (vacc, h) => vacc + when(h.bitwiseAND(mask) =!= 0, 1).otherwise(-1))
        acc.bitwiseOR(when(votes > 0, mask).otherwise(lit(0L)))
      })
    df.select(id.as("doc_id"), hashes.as("__hs"))
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
