package graft.similarity

import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}

import graft.SparkSuite

/** The Lloyd-step plan must evaluate the NearestCell kernel ONCE PER
  * VECTOR, i.e. in a Project BELOW the posexplode Generate. The combined
  * `select(cellOf(...), posexplode(...))` form plants the Generate under
  * the projection (ExtractGenerator), running the k·d-multiply kernel
  * once per exploded row — d× the work, measured 5.0 s vs 0.55 s per
  * step at the 26× scale step. A refactor that merges the two selects
  * would silently reintroduce that; this spec is the tripwire. */
class LloydPlanShapeSpec extends SparkSuite {

  import spark.implicits._

  test("lloydMeans plans nearest_cell below the Generate, once") {
    // parquet-backed, NOT a local Seq: ConvertToLocalRelation would
    // evaluate the kernel at optimize time and leave nothing to assert on
    val dir = graft.core.TempDirs.create("graft_lloyd_shape_").toString
    Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.1f, 0.9f))
    ).toDF("vec_id", "embedding").write.mode("overwrite").parquet(dir)
    val e = spark.read.parquet(dir)
    val cs = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val plan = Ivf.lloydMeans(e, "embedding", cs).queryExecution.optimizedPlan

    // exactly one kernel instance in the whole plan
    val total = "nearest_cell".r.findAllIn(plan.toString).size
    assert(total == 1, s"expected ONE nearest_cell, found $total:\n$plan")

    // and it lives in a Project UNDER the Generate, not above it
    def underGenerate(p: LogicalPlan): Boolean = p.collectFirst {
      case g: Generate => g
    }.exists(_.child.collectFirst {
      case pr: Project if pr.projectList.exists(
        _.toString.contains("nearest_cell")) => pr
    }.isDefined)
    assert(underGenerate(plan),
      s"nearest_cell not below the Generate (d-times-too-many shape):\n$plan")

    // the step itself still computes correct means on the toy corpus:
    // cell 0 = vectors 0,2 -> mean (0.95, 0.05); cell 1 = 1,3 -> (0.05, 0.95)
    val stepped = Ivf.lloydStep(e, "embedding", cs)
    assert(stepped(0).toList == List(0.95, 0.05) &&
      stepped(1).toList == List(0.05, 0.95), stepped.map(_.toList).toList)
  }
}
