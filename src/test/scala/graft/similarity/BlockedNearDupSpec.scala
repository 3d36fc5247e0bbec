package graft.similarity

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** The driver's `q_embedding_dedup` is the triangle-blocked exact
  * formulation ([[Similarity.cosineNearDupPairsBlocked]], 1-Bucket-Theta):
  * these specs pin its defining property — BIT-identical results to the
  * cross-join baseline (every pair examined exactly once; no pair dropped,
  * none duplicated) — on the real testdata at sf0.01 AND sf0.1, across
  * block counts including the degenerate ones, and assert the plan is the
  * cartesian-free equi-join shape the formulation exists to produce.
  */
class BlockedNearDupSpec extends SparkSuite {

  private def emb(sf: String): DataFrame =
    graft.queries.Tables.embeddings(spark, s"/root/testdata/$sf")

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("blocked == exact on sf0.01, including degenerate and odd block counts") {
    val e = emb("sf0.01").cache()
    try {
      val exact = pairsOf(Similarity.cosineNearDupPairs(e, threshold = 0.42))
      assert(exact.nonEmpty)
      for (blocks <- Seq(1, 3, 8, 1024)) { // 1024 >> n: most block pairs empty
        val blocked = pairsOf(Similarity.cosineNearDupPairsBlocked(e, 0.42, blocks))
        assert(blocked == exact, s"blocks=$blocks: ${
          (blocked diff exact).take(3)} extra, ${(exact diff blocked).take(3)} missing")
      }
    } finally e.unpersist()
  }

  test("blocked == exact on sf0.1 (the driver's gated scale)") {
    val e = emb("sf0.1").cache()
    try {
      val exact = pairsOf(Similarity.cosineNearDupPairs(e, threshold = 0.42))
      val blocked = pairsOf(Similarity.cosineNearDupPairsBlocked(e, 0.42, blocks = 8))
      assert(exact.size > 100) // 441 pairs at sf0.1 — a real workload, not a toy
      assert(blocked == exact)
    } finally e.unpersist()
  }

  test("size gate: over-maxRows corpus refuses with a directed error naming the linear twins") {
    val e = emb("sf0.001")
    val ex = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairsBlocked(e, 0.42, blocks = 8, maxRows = 10L)
    }
    // the error must ROUTE the caller: name both linear-scale formulations
    // and the opt-in escape hatch
    assert(ex.getMessage.contains("semanticDedup")
      && ex.getMessage.contains("cosineNearDupPairsLsh")
      && ex.getMessage.contains("maxRows"), ex.getMessage)
    // explicit opt-in past the gate still computes (escape hatch works)
    assert(Similarity.cosineNearDupPairsBlocked(e, 0.42, blocks = 8,
      maxRows = Long.MaxValue).count() >= 0)
    // the default gate admits every scale the artifacts certify (26x = 52k
    // rows) — sf0.001 is far under it
    assert(Similarity.cosineNearDupPairsBlocked(e, 0.42, blocks = 8).count() >= 0)
  }

  test("blocked plan is an equi-join: no cartesian or nested-loop node") {
    val plan = Similarity.cosineNearDupPairsBlocked(emb("sf0.001"), 0.42, blocks = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected join shape:\n$plan")
  }
}
