package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.dedup.Dedup
import graft.operators.Profile

/** The curation additions: decontamination, token chunking, PII redaction,
  * and the numeric profile. */
class CurationOpsSpec extends SparkSuite {
  import spark.implicits._

  // --- decontaminate ---

  private lazy val train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),      // shares a 4-gram with bench
    (2L, "one two three four five six seven"),        // clean
    (3L, "alpha beta gamma delta"),                   // exactly the contaminated 4-gram
    (4L, "beta gamma delta alpha"),                   // same words, different order: clean
    (5L, "too short"))                                // < n tokens: clean by construction
    .toDF("doc_id", "text")
  private lazy val bench = Seq(
    (100L, "prefix words alpha beta gamma delta suffix"))
    .toDF("doc_id", "text")

  test("decontaminate drops exactly the docs sharing an n-gram with the benchmark") {
    val out = Dedup.decontaminate(train, col("doc_id"), col("text"),
        bench, col("text"), n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(2L, 4L, 5L), s"survivors were $out")
  }

  test("decontaminate keeps the train schema and plans a broadcast for the bench side") {
    val out = Dedup.decontaminate(train, col("doc_id"), col("text"),
      bench, col("text"), n = 4)
    assert(out.columns.toSeq == train.columns.toSeq)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark n-gram set not broadcast:\n$plan")
  }

  // --- tokenChunks ---

  private def chunksOf(text: String, window: Int, stride: Int): Seq[(Int, Seq[String])] =
    Seq(text).toDF("text")
      .select(explode(TextAnalysis.tokenChunks(col("text"), window, stride)).as("c"))
      .select(col("c.chunk_idx"), col("c.toks"))
      .collect().map(r => (r.getInt(0), r.getSeq[String](1))).toSeq.sortBy(_._1)

  test("tokenChunks covers every token, overlaps by window-stride, trailing chunk short") {
    val toks = (0 until 10).map(i => s"t$i")
    val cs = chunksOf(toks.mkString(" "), window = 4, stride = 3)
    // 10 tokens, stride 3 -> ceil(10/3) = 4 chunks
    assert(cs.map(_._1) == Seq(0, 1, 2, 3))
    assert(cs(0)._2 == Seq("t0", "t1", "t2", "t3"))
    assert(cs(1)._2 == Seq("t3", "t4", "t5", "t6")) // 1-token overlap
    assert(cs(3)._2 == Seq("t9"))                   // trailing chunk runs short
    // coverage: concatenating chunk[k][0 until stride] rebuilds the doc
    assert(cs.flatMap(_._2.take(3)) == toks)
  }

  test("tokenChunks: empty and single-token docs") {
    assert(chunksOf("", 4, 3).isEmpty)
    assert(chunksOf("   ", 4, 3).isEmpty)
    assert(chunksOf("only", 4, 3) == Seq((0, Seq("only"))))
  }

  test("tokenChunks rejects stride > window or non-positive stride") {
    intercept[IllegalArgumentException] { TextAnalysis.tokenChunks(col("text"), 4, 5) }
    intercept[IllegalArgumentException] { TextAnalysis.tokenChunks(col("text"), 4, 0) }
  }

  // --- redactPii ---

  test("redactPii replaces emails and phones, leaves clean text alone") {
    val rows = Seq(
      "mail me at some.user+tag@sub.example.co.uk today",
      "call +1-555-0042 or 44-555-1234",
      "no pii here at all",
      "edge a@b.io end")
      .toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].collect()
    assert(rows(0) == "mail me at [EMAIL] today")
    assert(rows(1) == "call [PHONE] or [PHONE]")
    assert(rows(2) == "no pii here at all")
    assert(rows(3) == "edge [EMAIL] end")
  }

  test("redactPii covers the 10-digit NANP 3-3-4 form without leaking leading digits") {
    val rows = Seq(
      "dial 555-123-4567 now",        // bare NANP — the shape the old pattern leaked as 5[PHONE]
      "intl +44-20-7946-0958 ok",     // country code + 4 groups
      "or 1-800-555-0199 works")      // leading 1, 3-3-4 tail
      .toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].collect()
    assert(rows(0) == "dial [PHONE] now", s"got: ${rows(0)}")
    assert(!rows(0).exists(_.isDigit), "no digits may survive redaction")
    assert(rows(1) == "intl [PHONE] ok", s"got: ${rows(1)}")
    assert(rows(2) == "or [PHONE] works", s"got: ${rows(2)}")
  }

  test("redactPii cannot start a match mid-number: ISO dates and year runs survive intact") {
    val rows = Seq(
      "meeting on 2023-01-15 agreed",   // ISO date: unguarded pattern redacted "2[PHONE]"
      "in 1995 2000 2005 the",          // year runs with space separators
      "order 123456-78-90 shipped")     // long id: no 1-3 digit lead exists
      .toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].collect()
    assert(rows(0) == "meeting on 2023-01-15 agreed", s"got: ${rows(0)}")
    assert(rows(1) == "in 1995 2000 2005 the", s"got: ${rows(1)}")
    assert(rows(2) == "order 123456-78-90 shipped", s"got: ${rows(2)}")
  }

  // --- numericProfile ---

  private lazy val nums = Seq[(java.lang.Double, java.lang.Double)](
    (1.0, null), (2.0, 4.5), (2.0, null), (8.0, 4.5))
    .toDF("a", "b")

  test("numericProfile: one row per column with exact stats") {
    val out = Profile.numericProfile(nums, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(out("a") == ((4L, 0L, 3L, 1.0, 8.0, 3.25)))
    assert(out("b") == ((2L, 2L, 1L, 4.5, 4.5, 4.5)))
  }

  test("numericProfile plans ONE scan of the input regardless of column count") {
    val plan = Profile.numericProfile(nums, Seq("a", "b")).queryExecution
      .optimizedPlan.toString
    // localrelation appears once; for the approx variant also check no Expand
    val approxPlan = Profile.numericProfile(nums, Seq("a", "b"), exactDistinct = false)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      s"approx_count_distinct path should not Expand:\n$approxPlan")
    assert(plan.contains("Expand"), "exact multi-distinct plans via Expand (documented)")
  }

  test("numericProfile rejects unknown columns and empty column lists") {
    intercept[IllegalArgumentException] { Profile.numericProfile(nums, Seq("a", "zzz")) }
    intercept[IllegalArgumentException] { Profile.numericProfile(nums, Nil) }
  }
}
