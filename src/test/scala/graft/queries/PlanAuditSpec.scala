package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Whole-surface plan guardrail: no driver query may silently plan a
  * cartesian/nested-loop join — the classic way a correct-at-test-scale
  * query dies at 100 TB. Queries whose DESIGN is a deliberate small-side
  * cross join are whitelisted with the reason inline, so a regression in
  * any other query (a lost equi-key, a broadcast hint dropped, a refactor
  * that turns a banded join back into a theta join) fails CI instead of
  * surfacing in a cluster bill.
  */
class PlanAuditSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  // deliberate nested-loop/cross shapes, all with a 1-row or
  // query-set-sized (broadcastable by construction) build side:
  private val crossJoinByDesign = Set(
    "q_tfidf",          // 1-row corpus-count broadcast onto tf rows
    "q_unigram_quality", // 1-row total-token-count broadcast onto the vocabulary
    "q_bm25_topk",      // 1-row corpus-stats (N, avgdl, dfs) broadcast onto per-doc tf rows
    "q_knn_cosine",     // brute-force ANN baseline: broadcast query set x corpus scan
    "q_knn_quantized",  // same scan shape as q_knn_cosine, over int8 codes (4x cheaper)
    "q_chisq"           // |langs| x |sources| label cross product (both query-set-sized):
                        // zero-observation cells must exist to carry expected mass
    // q_embedding_dedup left this list in round 5: now the triangle-blocked
    // exact equi-join (Similarity.cosineNearDupPairsBlocked) — same results,
    // no cartesian node
    // q_streaming_choptime left in round 7: the anchor normalization is now
    // a global window min over the read-back, no crossJoin node
  )

  test("no driver query plans a cartesian/nested-loop join or single-partition Coalesce unawares") {
    // ONE pass over the surface (constructing a streaming-gate query runs
    // its whole micro-batch replay, so every extra pass costs the full
    // streaming floor), both predicates checked per plan. The Coalesce
    // match is digit-bounded: a bare contains("Coalesce 1") would also
    // flag a legitimate Coalesce 16.
    val coalesce1 = java.util.regex.Pattern.compile("Coalesce 1(?![0-9])")
    val audited = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      spark.catalog.clearCache()
      (name,
        plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"),
        coalesce1.matcher(plan).find())
    }
    val crossPlanned = audited.collect { case (n, true, _) => n }.toSet
    val offenders = crossPlanned -- crossJoinByDesign
    assert(offenders.isEmpty,
      s"unexpected cartesian/nested-loop plans in: ${offenders.mkString(", ")}")
    // the whitelist must stay honest: every entry actually cross-joins
    val stale = crossJoinByDesign -- crossPlanned
    assert(stale.isEmpty, s"whitelist entries no longer cross-join: ${stale.mkString(", ")}")
    // "Coalesce 1" = the whole input pulled through one task — the other
    // classic works-at-test-scale/dies-at-100TB shape (q_graph_lowered
    // carried one until round 7's distributed prefix-scan)
    val funneled = audited.collect { case (n, _, true) => n }
    assert(funneled.isEmpty,
      s"single-partition Coalesce in: ${funneled.mkString(", ")}")
  }
}
