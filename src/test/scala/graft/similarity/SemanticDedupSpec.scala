package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Similarity.semanticDedup]] (SemDeDup-style cluster-then-dedup) trades
  * cross-cell recall for a join confined to single cells. These specs pin
  * (a) the keep rule exactly — a vector is dropped iff a lower-id same-cell
  * vector sits within the cosine threshold — by recomputing it from first
  * principles, (b) the recall actually achieved vs the exact corpus-wide
  * pair set on the real testdata (measured, not assumed), and (c) the plan
  * shape: the whole pipeline must stay an equi-join on the cell key.
  */
class SemanticDedupSpec extends SparkSuite {

  private def emb(sf: String): DataFrame =
    graft.queries.Tables.embeddings(spark, s"/root/testdata/$sf")

  private def seedCentroids(e: DataFrame): Array[Array[Double]] =
    Ivf.seedCentroids(e, "vec_id", "embedding", k = 8)

  test("keep rule: dropped iff a lower-id same-cell neighbor within threshold") {
    val e = emb("sf0.01").cache()
    try {
      val centroids = seedCentroids(e)
      val kept = Similarity.semanticDedup(e, centroids, threshold = 0.42)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

      // First principles: assign cells, enumerate same-cell pairs exactly
      // once via the id order, drop the higher id of any pair >= threshold.
      val cells = e.select(col("vec_id"),
          Ivf.cellOf(col("embedding"), centroids).as("cell"), col("embedding"))
      val a = cells.select(col("cell"), col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val b = cells.select(col("cell"), col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      val dropped = a.join(b, "cell").filter(col("a_id") < col("b_id"))
        .filter(graft.operators.Relational.roundp(
          Similarity.cosineHof(col("a_emb"), col("b_emb")), 6) >= 0.42)
        .select("b_id").distinct().collect().map(_.getLong(0)).toSet
      val allCells = cells.select("vec_id", "cell")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

      assert(kept.keySet == allCells.keySet -- dropped)
      assert(kept.forall { case (id, cell) => allCells(id) == cell })
      assert(dropped.nonEmpty, "threshold 0.42 should drop real near-dups at sf0.01")
    } finally e.unpersist()
  }

  test("cross-cell recall vs the exact corpus-wide pair set is measured and high") {
    val e = emb("sf0.01").cache()
    try {
      val centroids = seedCentroids(e)
      val exact = Similarity.cosineNearDupPairs(e, threshold = 0.42)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val cellOf = e.select(col("vec_id"), Ivf.cellOf(col("embedding"), centroids))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val withinCell = exact.filter { case (x, y) => cellOf(x) == cellOf(y) }
      val recall = withinCell.size.toDouble / exact.size
      info(f"within-cell recall at k=8 seed centroids: $recall%.3f " +
        s"(${withinCell.size}/${exact.size} exact pairs)")
      // Measured: 0.353 (12/34) with the 8 seed-point centroids — the
      // untrained quantizer co-locates near-dups well above the 1/8 chance
      // level but far from perfectly; that gap is the approximation
      // SemDeDup accepts, and exactly what this test exists to expose.
      // The floor is 2× chance: below that the cell assignment is broken.
      assert(exact.size > 10, "need a real pair population to measure recall")
      assert(recall >= 0.25, f"recall $recall%.3f is at chance — cell assignment broken?")
    } finally e.unpersist()
  }

  test("plan is cell-key equi-join: no cartesian or nested-loop node") {
    val e = emb("sf0.001")
    val plan = Similarity.semanticDedup(e, seedCentroids(e), threshold = 0.42)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected join shape:\n$plan")
  }
}
