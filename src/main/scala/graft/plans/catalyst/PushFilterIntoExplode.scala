package graft.plans.catalyst

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
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
  * (or at runtime through `spark.experimental.extraOptimizations`).
  *
  * Besides the optimizer rule, registers the library's native codegen'd
  * kernels as SQL functions, so `spark.sql` users get the same fused
  * loops the Column API exposes:
  * `cosine_similarity(array<float>, array<float>)`,
  * `shingle_hash64(array<string>, n)` (n a literal int),
  * `srp_buckets(array<float>, dims, planesPerTable, tables)` (literal
  * ints). Static parameters must be literals because the kernels
  * materialize per-operator state (sign matrices) at plan time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.litInt

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PushFilterIntoExplode)
    e.injectFunction((FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b) takes 2 arguments")
        graft.functions.CosineSimilarity(args(0), args(1))
      }))
    e.injectFunction((FunctionIdentifier("shingle_hash64"),
      new ExpressionInfo(classOf[graft.functions.ShingleHash64].getName, "shingle_hash64"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hash64(tokens, n) takes 2 arguments")
        graft.functions.ShingleHash64(args(0), litInt(args(1), "n"))
      }))
    e.injectFunction((FunctionIdentifier("srp_buckets"),
      new ExpressionInfo(classOf[graft.functions.SrpBuckets].getName, "srp_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "srp_buckets(emb, dims, planesPerTable, tables) takes 4 arguments")
        graft.functions.SrpBuckets(args(0),
          litInt(args(1), "dims"), litInt(args(2), "planesPerTable"), litInt(args(3), "tables"))
      }))
  }
}

object GraftExtensions {
  private def litInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be a literal integer, got $other")
  }
}
