package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Dedup.repeatedSpanStats]] is the exact-substring dedup signal (Lee et
  * al. ACL'22): per doc, the fraction of positional token n-gram spans that
  * also occur verbatim in at least one OTHER document. These specs pin the
  * positional (non-distinct) counting, the ≥2-distinct-docs bar, the short-
  * doc zero case, and — on real testdata — that the 64-bit span-hash
  * formulation matches a string-gram recomputation (the collision-freedom
  * the DuckDB oracle relies on).
  */
class RepeatedSpanSpec extends SparkSuite {

  test("positional counting, cross-doc bar, short docs — exact values") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c",       // grams: "a b", "b c"
      2L -> "a b d",       // grams: "a b", "b d"
      3L -> "x",           // shorter than n=2: zero grams
      4L -> "a b a b",     // grams: "a b", "b a", "a b" — 2 dup positions
      5L -> "z z z z"      // "z z" ×3, but only within THIS doc: not dup
    ).toDF("doc_id", "text")

    val out = Dedup.repeatedSpanStats(docs, col("doc_id"), col("text"), n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3)))).toMap

    assert(out(1L) == ((2, 1L, 0.5)))       // "a b" shared with docs 2 and 4
    assert(out(2L) == ((2, 1L, 0.5)))
    assert(out(3L) == ((0, 0L, 0.0)))       // len < n → 0 grams, frac 0.0
    assert(out(4L) == ((3, 2L, 0.666667)))  // BOTH "a b" positions count
    assert(out(5L) == ((3, 0L, 0.0)))       // within-doc repetition alone ≠ dup
  }

  test("n=1 degenerates to shared-token fraction; invalid n rejected") {
    import spark.implicits._
    val docs = Seq(1L -> "p q", 2L -> "q r").toDF("doc_id", "text")
    val out = Dedup.repeatedSpanStats(docs, col("doc_id"), col("text"), n = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L)) // only "q" is cross-doc
    val e = intercept[IllegalArgumentException] {
      Dedup.repeatedSpanStats(docs, col("doc_id"), col("text"), n = 0)
    }
    assert(e.getMessage.contains("span length"))
  }

  test("64-bit span hashes match a string-gram recomputation on sf0.001") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val n = 5
    val hashed = Dedup.repeatedSpanStats(docs, col("doc_id"), col("text"), n)

    // Independent recomputation with the gram STRING as the join key — the
    // formulation the DuckDB oracle replays.
    val toks = graft.text.TextAnalysis.tokens(col("text"))
    val gramArr = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    val grams = docs.select(col("doc_id"), explode(gramArr).as("g"))
    val perDoc = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("occ"))
    val withDf = perDoc.withColumn("docs",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
    val dup = withDf.filter(col("docs") >= 2)
      .groupBy("doc_id").agg(sum("occ").as("n_dup_s"))

    val joined = hashed.join(dup, Seq("doc_id"), "left")
      .filter(col("n_dup") =!= coalesce(col("n_dup_s"), lit(0L)))
    assert(joined.count() == 0, "hashed and string-gram span counts diverge")
    assert(hashed.filter(col("n_dup") > 0).count() > 0,
      "testdata should contain real cross-doc repeated spans")
  }
}
