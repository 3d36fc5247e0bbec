package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TopKByScoreAggSpec extends SparkSuite {
  import spark.implicits._

  test("agrees with the window formulation on the real documents") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val scored = docs.select(col("lang"),
      graft.text.TextAnalysis.qualityScore(col("text")).as("q"), col("doc_id"))
    val viaWindow = graft.operators.Relational.topKPerGroup(
        scored, 3, Seq(col("lang")), Seq(col("q").desc, col("doc_id")))
      .select(col("lang"), col("rank"), col("doc_id"), col("q"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val viaAgg = scored.as[(String, Double, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(new TopKByScoreAgg(3).column)
      .flatMap { case (lang, top) =>
        top.zipWithIndex.map { case ((q, id), i) => (lang, i + 1, id, q) }
      }
      .collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("buffer is bounded by k through reduce and merge, ties break by smaller id") {
    val agg = new TopKByScoreAgg(2)
    val b = Seq((1.0, 5L), (3.0, 1L), (3.0, 2L), (2.0, 9L), (3.0, 0L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(b.length == 2)
    assert(agg.finish(b) == Seq((3.0, 0L), (3.0, 1L))) // ties: smaller id wins
    val merged = agg.merge(
      Seq((5.0, 7L), (1.0, 1L)).foldLeft(agg.zero)(agg.reduce),
      Seq((4.0, 3L), (0.5, 2L)).foldLeft(agg.zero)(agg.reduce))
    assert(merged.length == 2)
    assert(agg.finish(merged) == Seq((5.0, 7L), (4.0, 3L)))
  }

  test("groups smaller than k return everything, best first") {
    val agg = new TopKByScoreAgg(10)
    val b = Seq((1.0, 1L), (2.0, 2L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == Seq((2.0, 2L), (1.0, 1L)))
    intercept[IllegalArgumentException] { new TopKByScoreAgg(0) }
  }

  test("plans a partial (map-side) aggregate before the exchange") {
    val ds = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 3.0, 3L)).toDS()
    val plan = ds.groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(new TopKByScoreAgg(2).column)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"typed aggregate missing:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"no partial (map-side) aggregation stage — the whole point:\n$plan")
  }
}
