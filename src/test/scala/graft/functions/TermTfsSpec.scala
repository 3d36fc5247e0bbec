package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.text.TextAnalysis

/** TermTfs must agree element-for-element with the composed-builtin
  * formulation it replaces (size + per-term size∘filter over
  * TextAnalysis.tokens), and the Bm25 plan must evaluate it exactly once
  * per row (the CollapseProject non-cheap-alias guard the rewrite leans
  * on). */
class TermTfsSpec extends SparkSuite {

  import spark.implicits._

  private val terms = Seq("dup", "vector", "merge", "the")

  test("fuzz agreement with size/filter over tokens, including edge whitespace") {
    val rnd = new scala.util.Random(1601)
    val words = Vector("dup", "vector", "merge", "the", "a", "dups", "DUP",
      "vect", "x", "", " ", "\u000B", "\u00A0", "théâtre", "мир")
    val seps = Vector(" ", "  ", "\t", "\n", "\r", "\f", "\u000B", "\u00A0")
    val docs = (1 to 300).map { i =>
      val n = rnd.nextInt(12)
      val s = (1 to n).map(_ => words(rnd.nextInt(words.size)) +
        seps(rnd.nextInt(seps.size))).mkString
      (i.toLong, if (rnd.nextInt(20) == 0) null else s)
    } :+ (1000L, "") :+ (1001L, "   ") :+ (1002L, "dup dup dup") :+
      (1003L, "\u000Bdup\u000B") // VT is \s in Java regex: a separator
    val df = docs.toDF("id", "text")

    val toks = TextAnalysis.tokens(col("text"))
    // expected = the composed-builtin counts (the formulation replaced);
    // null texts asserted separately (size(null) is null — getInt would NPE)
    val expected = df.filter(col("text").isNotNull)
      .select((col("id") +: size(toks).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).as(s"tf_$i") }): _*)
      .collect().map(r => r.getLong(0) ->
        (0 to terms.size).map(j => r.getInt(j + 1)).toList).toMap

    val got = df.select(col("id"), TermTfs(toks, terms).as("tfs"))
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(1)) null
          else r.getSeq[Int](1).toList)
      }.toMap

    docs.foreach { case (id, text) =>
      if (text == null) assert(got(id) == null, s"id=$id null text")
      else assert(got(id) == expected(id),
        s"id=$id text=${text.replace("\n", "\\n")}: got ${got(id)}, " +
          s"expected ${expected(id)}")
    }
  }

  test("refuses duplicate terms and non-string-array input") {
    intercept[IllegalArgumentException] { TermTfs(col("x"), Seq("a", "a")) }
    // analysis is eager at select() in Spark 4 — the type-check error
    // surfaces at construction, not at collect
    val e = intercept[Exception] {
      Seq((1L, Seq(1, 2))).toDF("id", "xs")
        .select(TermTfs(col("xs"), Seq("a"))).collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("array<string>") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("Bm25 optimized plan evaluates term_tfs once per corpus scan") {
    // the ad-hoc plan scans the corpus twice by design (stats row +
    // score pass) — each scan must carry exactly ONE kernel instance,
    // i.e. 2 total. The composed formulation this replaced would show
    // 2 x (Q+1) = 8 tokenize trees here; and if CollapseProject ever
    // started inlining the non-cheap __tfs alias into its Q+1
    // extractions, the count would jump the same way.
    val df = Seq((1L, "dup vector"), (2L, "merge merge")).toDF("doc_id", "text")
    val plan = graft.text.Bm25.topK(df, col("doc_id"), col("text"),
      Seq("dup", "vector", "merge"), k = 5)
      .queryExecution.optimizedPlan.toString
    val n = "term_tfs".r.findAllIn(plan).size
    assert(n == 2, s"expected term_tfs once per corpus scan (2), found $n:\n$plan")
  }
}
