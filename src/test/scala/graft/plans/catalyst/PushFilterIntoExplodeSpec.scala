package graft.plans.catalyst

import org.apache.spark.sql.catalyst.expressions.ArrayFilter
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate}
import org.apache.spark.sql.functions._

import graft.SparkSuite

class PushFilterIntoExplodeSpec extends SparkSuite {

  private def query = {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 8)
  }

  test("filter over explode is rewritten to array_filter inside the generator") {
    val baseline = query.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PushFilterIntoExplode
    try {
      val optimized = query.queryExecution.optimizedPlan
      val hasArrayFilterGen = optimized.collect {
        case g: Generate if g.generator.children.exists(_.isInstanceOf[ArrayFilter]) => g
      }
      assert(hasArrayFilterGen.nonEmpty, s"no ArrayFilter generator in:\n$optimized")
      val residualWordFilters = optimized.collect {
        case f: Filter if f.condition.references.exists(_.name == "word") => f
      }
      assert(residualWordFilters.isEmpty, s"filter not absorbed:\n$optimized")
      // identical results
      val got = query.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got.sameElements(baseline))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PushFilterIntoExplode)
    }
  }
}
