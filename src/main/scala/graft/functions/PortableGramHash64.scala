package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression producing the PORTABLE-family hash of every
  * word n-gram of a token array as `array<bigint>` — [[ShingleHash64]]'s
  * shape with [[PortableHash]] arithmetic, so a SQL oracle can replay
  * each value (`ord·31^i` sums over the space-joined gram) while the hot
  * loop runs as one JVM pass.
  *
  * The composed-builtin formulation
  * (`transform(sequence(0, m−gram), i => polyHash(concat_ws(" ",
  * slice(toks, i+1, gram))))`) evaluates interpreted per gram: an array
  * slice allocation and a string build through the expression walker
  * before the hash even starts. Here each gram joins its tokens into one
  * StringBuilder and hashes its first [[PortableHash.MaxChars]] code
  * points directly. Unselected positions are NOT deduplicated — winnowing
  * (the main consumer) is position-sensitive.
  *
  * Gram semantics match `concat_ws(" ", …)`: null tokens (never produced
  * by our tokenizer) are SKIPPED, not rendered. Fewer than `gram` tokens
  * yields an empty array; a null array propagates null.
  */
case class PortableGramHash64(child: Expression, gram: Int)
    extends UnaryExpression with Serializable {

  require(gram >= 1, s"shingle size must be >= 1 token (got $gram)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_gram_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PortableGramHash64.compute(input.asInstanceOf[ArrayData], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableGramHash64.compute($c, $gram);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableGramHash64 {

  /** One pass per document; called from both interpreted eval and
    * generated code. */
  def compute(toks: ArrayData, gram: Int): ArrayData = {
    val m = toks.numElements()
    if (m < gram) return new GenericArrayData(Array.emptyLongArray)
    val strs = new Array[String](m)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      strs(i) = if (s == null) null else s.toString
      i += 1
    }
    val out = new Array[Long](m - gram + 1)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i <= m - gram) {
      sb.setLength(0)
      var j = 0
      while (j < gram) {
        val t = strs(i + j)
        if (t != null) { // concat_ws skips nulls
          if (sb.length() > 0) sb.append(' ')
          sb.append(t)
        }
        j += 1
      }
      out(i) = hashPrefix(sb)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[PolyHash48]]'s arithmetic over the first
    * [[PortableHash.MaxChars]] code points of a builder — avoids
    * materializing the joined gram string. */
  private def hashPrefix(sb: java.lang.StringBuilder): Long = {
    val len = sb.length()
    if (len == 0) return 0L
    var acc = 0L
    var i = 0
    var n = 0
    val max = PortableHash.MaxChars
    while (i < len && n < max) {
      val cp = sb.codePointAt(i)
      acc += cp.toLong * PolyHash48.powersForKernels(n)
      i += Character.charCount(cp)
      n += 1
    }
    acc % PortableHash.P
  }

  /** Column wrapper over a token-array column. */
  def apply(tokens: Column, gram: Int): Column =
    Bridge.column(PortableGramHash64(Bridge.expression(tokens), gram))
}
