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

  test("NaN scores rank above all doubles (Spark desc-sort order) and cannot poison the buffer") {
    val agg = new TopKByScoreAgg(2)
    // NaN arrives first and lands at the head (worst slot after one more
    // item); under raw > comparisons every later item would be dropped
    val b = Seq((Double.NaN, 9L), (1.0, 1L), (5.0, 2L), (7.0, 3L))
      .foldLeft(agg.zero)(agg.reduce)
    // Spark sorts NaN above every double under desc, so NaN stays top-1
    // and the best real score fills slot 2 — NOT (NaN, 1.0). (Primitive
    // NaN != NaN, so compare the fields, not the tuples.)
    val out = agg.finish(b)
    assert(out.length == 2 && out.head._1.isNaN && out.head._2 == 9L
      && out(1) == (7.0, 3L), s"got: $out")
    // -0.0 ties with 0.0 (Spark normalizes), so the smaller id wins
    val z = Seq((0.0, 5L), (-0.0, 2L), (-1.0, 1L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(z).map(_._2) == Seq(2L, 5L))
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
