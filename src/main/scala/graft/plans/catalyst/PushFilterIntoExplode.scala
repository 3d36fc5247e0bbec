package graft.plans.catalyst

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** The reference's `expandFilter` rewrite (`streamExpand ≫ streamFilter p
  * → streamMap (filter p) ≫ streamExpand`, `LogicalOptimiser.hs:425-431`)
  * expressed at the CATALYST level: a deterministic filter that references
  * only the exploded element is pushed inside the array as `array_filter`,
  * so the Generate produces only surviving rows instead of materializing
  * the full explosion and filtering after. At scale this shrinks the
  * generator's output (often by the filter's selectivity) before any
  * downstream exchange sees it.
  *
  * Conditions: non-outer explode of an array, single generator output,
  * deterministic predicate over only that output. (Outer explodes emit a
  * null row for empty arrays; pushing a filter could turn a non-empty
  * array empty and CREATE such a row — excluded.)
  */
object PushFilterIntoExplode extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, g @ Generate(e @ Explode(arr), _, false, _, genOutput, _))
        if genOutput.size == 1 && cond.deterministic &&
          cond.references.subsetOf(AttributeSet(genOutput)) &&
          arr.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
      val elem = genOutput.head
      val lv = NamedLambdaVariable("graft_x", elem.dataType, elem.nullable)
      val body = cond.transform {
        case a: Attribute if a.semanticEquals(elem) => lv
      }
      val filtered = ArrayFilter(arr, LambdaFunction(body, Seq(lv)))
      g.copy(generator = e.copy(child = filtered))
  }
}

/** Register via `spark.sql.extensions=graft.plans.catalyst.GraftExtensions`
  * (or at runtime through `spark.experimental.extraOptimizations`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => PushFilterIntoExplode)
}
