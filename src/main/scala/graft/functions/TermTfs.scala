package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing `[dl, tf_0, ..., tf_{Q-1}]` from a
  * token array in ONE pass: dl = the array length, tf_i = how many tokens
  * equal the i-th query term — the per-document inputs of a Q-term BM25
  * score ([[graft.text.Bm25]]).
  *
  * The composed-builtin formulation evaluated the token array Q+1 times
  * per document (`size(tokens)` for dl plus one
  * `size(filter(tokens, _ === term))` per term): each is a separate
  * higher-order-function tree whose lambda runs INTERPRETED, and — the
  * [[ArraySetCount]] lesson again — codegen subexpression elimination
  * does not reach across interpreted HOF lambdas, so a 4-term query
  * re-ran the whitespace split + array walk five times per row. Measured
  * at the 26x scale step that left q_bm25_topk at 10.9x (runs=3,
  * adjudicated GENUINE per-doc work). This kernel interns the term ->
  * slot map once per expression instance and walks the array once.
  *
  * Null elements count toward NO term and — unlike `size`, which counts
  * them — are excluded from dl; the only caller feeds the null-free
  * output of `TextAnalysis.tokens` (its lambda drops nulls), where the
  * two conventions coincide (TermTfsSpec pins the agreement). A null
  * array propagates null. Duplicate terms are refused: each would count
  * the same slot and silently shadow the other in the caller's tf_i
  * numbering.
  */
case class TermTfs(child: Expression, terms: Seq[String])
    extends UnaryExpression with Serializable {

  require(terms.nonEmpty, "TermTfs needs at least one term")
  require(terms.distinct == terms, s"duplicate terms: $terms")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "term_tfs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val slots: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.size * 2)
    terms.zipWithIndex.foreach { case (t, i) => m.put(UTF8String.fromString(t), i) }
    m
  }

  @transient private lazy val nTerms: Int = terms.size

  override def nullSafeEval(input: Any): Any =
    TermTfs.compute(input.asInstanceOf[ArrayData], slots, nTerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val slotsRef = ctx.addReferenceObj("termSlots", slots,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, Integer>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermTfs.compute($c, $slotsRef, $nTerms);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermTfs {

  /** One pass; called from both interpreted eval and generated code. */
  def compute(arr: ArrayData, slots: java.util.HashMap[UTF8String, Integer],
              nTerms: Int): ArrayData = {
    val m = arr.numElements()
    val out = new Array[Int](nTerms + 1)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        out(0) += 1
        val slot = slots.get(s)
        if (slot != null) out(slot + 1) += 1
      }
      i += 1
    }
    // boxing once per row is the GenericArrayData contract; (Q+1) ints
    new GenericArrayData(out.map(Int.box))
  }

  /** Column wrapper over a token-array column. */
  def apply(tokens: Column, terms: Seq[String]): Column =
    Bridge.column(TermTfs(Bridge.expression(tokens), terms))
}
