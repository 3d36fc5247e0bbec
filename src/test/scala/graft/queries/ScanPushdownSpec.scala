package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Scan-efficiency guardrail: predicates must reach the parquet scan as
  * PushedFilters and projections must prune ReadSchema — at 100 TB a scan
  * that reads every column for a 3-column query, or filters after the
  * read, is the whole bill. A refactor that breaks pushdown (an opaque UDF
  * wrapped around a filter column, a lambda where a Column belongs) fails
  * here instead of in a cluster.
  */
class ScanPushdownSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    p
  }

  test("q_filter pushes its predicates into the events scan and prunes columns") {
    val p = plan("q_filter")
    assert(p.contains("PushedFilters: ["), s"no pushdown section in:\n$p")
    assert(p.contains("EqualTo(event_type,click)"),
      s"event_type equality must reach the scan:\n$p")
    assert(p.contains("GreaterThan(value,50.0)"),
      s"value range must reach the scan:\n$p")
    // projection pruning: the untouched wide column must not be read
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("props"),
      s"props is not referenced and must be pruned from ReadSchema:\n$readSchema")
  }

  test("document queries prune the scan to the referenced columns") {
    val p = plan("q_token_stats")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty, s"no ReadSchema in:\n$p")
    assert(!readSchema.contains("lang") && !readSchema.contains("url"),
      s"unreferenced document columns must be pruned:\n$readSchema")
  }

  test("lineitem aggregate prunes to the aggregated columns") {
    val p = plan("q1_agg")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_comment"),
      s"l_comment is never referenced and must be pruned:\n$readSchema")
  }
}
