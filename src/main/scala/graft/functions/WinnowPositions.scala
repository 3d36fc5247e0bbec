package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression for ROBUST WINNOWING position selection
  * (Schleimer, Wilkerson & Aiken, SIGMOD'03 — the MOSS rule): over a
  * hash array, for each sliding window of `window` consecutive hashes
  * select the minimum at its RIGHTMOST position on ties; return the
  * distinct selected 1-based positions in first-selection order.
  *
  * The composed-builtin formulation evaluates interpreted per window
  * START: an `array_min(slice(...))` plus a `filter(sequence(...))`
  * rightmost-tie scan — O(m·window²) expression-walker work per
  * document. This kernel is the classic monotonic-deque sliding-window
  * minimum, adapted to the rightmost-tie rule (an incoming value pops
  * `>=` from the back, so among equals the newest index survives):
  * O(m) amortized per document, one pass.
  *
  * Output order parity with
  * `array_distinct(transform(starts, j => rightmostMin(j)))`: positions
  * are emitted as windows first select them, and a position's selection
  * span is CONTIGUOUS (a blocker to its right outlives it in the window;
  * a strictly-smaller blocker to its left exits before it), so dedup on
  * first selection reproduces array_distinct exactly — the agreement
  * spec pins it on random arrays with engineered ties.
  *
  * A short document (m < window) is one truncated window — its minimum
  * still selected. Empty arrays yield an empty selection; null
  * propagates.
  */
case class WinnowPositions(child: Expression, window: Int)
    extends UnaryExpression with Serializable {

  require(window >= 1, s"winnow window must be >= 1 (got $window)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "winnow_positions"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowPositions.compute(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowPositions.compute($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowPositions {

  /** One deque pass; called from both interpreted eval and generated
    * code. Indices in the deque are 0-based; output positions 1-based
    * (SQL element_at convention, matching the HOF form). */
  def compute(gh: ArrayData, window: Int): ArrayData = {
    val m = gh.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyIntArray)
    val vals = gh.toLongArray()
    val deque = new Array[Int](m) // indices, values increasing front→back
    var head = 0
    var tail = 0 // exclusive
    val out = new Array[Int](m)
    var k = 0
    var lastSel = -1
    var i = 0
    while (i < m) {
      // rightmost-tie rule: equal values are superseded by the newer index
      while (tail > head && vals(deque(tail - 1)) >= vals(i)) tail -= 1
      deque(tail) = i; tail += 1
      // window ending at i starts at i-window+1; evict indices before it
      while (deque(head) < i - window + 1) head += 1
      // a full window ends here (or the single truncated window of a
      // short document ends at m-1)
      if (i >= window - 1 || i == m - 1) {
        val sel = deque(head)
        if (sel != lastSel) { out(k) = sel + 1; k += 1; lastSel = sel }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Column wrapper over a hash-array column. */
  def apply(hashes: Column, window: Int): Column =
    Bridge.column(WinnowPositions(Bridge.expression(hashes), window))
}
