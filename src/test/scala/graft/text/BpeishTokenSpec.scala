package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[TextAnalysis.bpeishTokenCount]] pins the engine-portable GPT-2-style
  * pre-tokenizer: contraction suffixes split off, letter/digit runs take a
  * leading space, punctuation runs stay separate, residual whitespace runs
  * collapse to one token (the no-lookahead divergence from GPT-2 proper,
  * documented on [[TextAnalysis.BpeishPattern]]).
  */
class BpeishTokenSpec extends SparkSuite {

  private def counts(texts: (Long, String)*): Map[Long, (Int, Double)] = {
    import spark.implicits._
    texts.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.bpeishTokenCount(col("text")),
        TextAnalysis.bpeishFertility(col("text")))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
  }

  test("letter/digit/punct runs, contractions, whitespace collapse") {
    val out = counts(
      1L -> "Hello world",   // "Hello", " world"
      2L -> "it's fine",     // "it", "'s", " fine"
      3L -> "x2 3.14!",      // "x", "2", " 3", ".", "14", "!"
      4L -> "a  b",          // "a", "  " (one whitespace run), "b"
      5L -> ""               // nothing
    )
    assert(out(1L) == ((2, 1.0)))
    assert(out(2L) == ((3, 1.5)))
    assert(out(3L) == ((6, 3.0)))
    assert(out(4L) == ((3, 1.5)))
    assert(out(5L) == ((0, 0.0)))
  }

  test("vertical tab is punctuation, not whitespace — the RE2-compatible reading") {
    // Java \s includes U+000B, RE2's does not; the pattern uses the
    // explicit class [\t\n\f\r ] so BOTH engines read VT as residual
    // punctuation: "!!" is one punct run, not punct|ws|punct
    val out = counts(1L -> "!\u000B!", 2L -> "a\u000Bb", 3L -> "a b")
    assert(out(1L)._1 == 1, "VT must fold into the punctuation run")
    assert(out(2L)._1 == 3) // "a", VT-punct, "b"
    assert(out(3L)._1 == 2) // real space prefixes the next word
  }

  test("pre-token count bounds whitespace word count from above on testdata") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = docs.select(
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpe"),
        TextAnalysis.tokenCount(col("text")).as("n_words"))
      .filter(col("n_bpe") < col("n_words"))
    assert(bad.count() == 0, "every whitespace word yields >= 1 pre-token")
  }
}
