package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Agreement specs for the portable-family codegen kernels against the
  * composed-builtin HOF formulations they replaced (kept as `*Hof`
  * twins — the ShingleHash64 pattern: two independently-derived
  * implementations of the same arithmetic must agree value-for-value,
  * so the SQL oracles that replay the arithmetic keep holding). */
class PortableKernelsSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(1405)
  private val words = Vector("alpha", "beta", "Zürich", "naïve", "😀", "x",
    "longtokenlongtokenlongtokenlongtokenlongtokenlongtoken", "q7", "-", "the")
  private def randText(n: Int): String =
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")

  test("RollingFp64 kernel == HOF fold on random, empty, short, and >64-token texts") {
    val texts = Seq("", "one", "  spaced   out  ", randText(3), randText(64),
      randText(65), randText(200), "😀 " * 70) ++ (1 to 20).map(i => randText(1 + rnd.nextInt(100)))
    val df = texts.toDF("text")
    for (maxTokens <- Seq(1, 7, 64)) {
      val kernel = df.select(
        graft.text.TextAnalysis.rollingPrefixFingerprint(col("text"), maxTokens))
        .as[Long].collect().toSeq
      val hof = df.select(
        graft.text.TextAnalysis.rollingPrefixFingerprintHof(col("text"), maxTokens))
        .as[Long].collect().toSeq
      assert(kernel == hof, s"maxTokens=$maxTokens")
    }
  }

  test("PortableGramHash64 kernel == HOF transform on random texts across gram sizes") {
    val texts = Seq("", "a", "a b", randText(2), randText(3), randText(50)) ++
      (1 to 20).map(_ => randText(1 + rnd.nextInt(40)))
    val df = texts.toDF("text")
    for (gram <- Seq(1, 2, 3, 5)) {
      val kernel = df.select(graft.dedup.Dedup.gramPolyHashes(col("text"), gram))
        .as[Seq[Long]].collect().toSeq
      val hof = df.select(graft.dedup.Dedup.gramPolyHashesHof(col("text"), gram))
        .as[Seq[Long]].collect().toSeq
      assert(kernel == hof, s"gram=$gram")
    }
  }

  test("ArraySetCount kernel == HOF filter-count; stopwordRatio twins agree") {
    val texts = Seq("", "the the the", "a of and to in is", "nonmatching words only",
      "the Zürich of 😀 a") ++ (1 to 20).map(_ => randText(1 + rnd.nextInt(60)))
    val df = texts.toDF("text")
    val toks = graft.text.TextAnalysis.tokens(col("text"))
    val kernel = df.select(graft.text.TextAnalysis.stopwordRatio(toks)).as[Double].collect().toSeq
    val hof = df.select(graft.text.TextAnalysis.stopwordRatioHof(toks)).as[Double].collect().toSeq
    assert(kernel == hof)
    // langHeuristic end-to-end through the kernel path: still deterministic
    // and matching a driver-side recount on a known-language text
    val pred = Seq("the cat and the dog of a to house")
      .toDF("text").select(graft.text.TextAnalysis.langHeuristic(col("text")))
      .collect().head.getString(0)
    assert(pred == "en")
  }

  test("WinnowPositions kernel == HOF selection, including engineered ties and short docs") {
    // heavy tie mass: values drawn from a tiny domain so rightmost-tie
    // selection and selection-span dedup both get exercised. Empty
    // arrays are excluded: the HOF form's truncated-window arithmetic
    // degenerates to [null] there (an artifact its one caller,
    // winnowFromHashes, gates on m <= 0 before reaching) while the
    // kernel returns [] — the sane value for the unguarded primitive.
    val arrays: Seq[Seq[Long]] = Seq(
      Seq(5L), Seq(3L, 3L, 3L, 3L), Seq(4L, 1L, 1L, 4L, 1L)) ++
      (1 to 30).map(_ => Seq.fill(1 + rnd.nextInt(60))(rnd.nextInt(5).toLong)) ++
      (1 to 10).map(_ => Seq.fill(1 + rnd.nextInt(60))(rnd.nextLong()))
    val df = arrays.toDF("gh")
    for (window <- Seq(1, 2, 4, 7, 100)) {
      val kernel = df.select(graft.dedup.Dedup.winnowSelectedPositions(col("gh"), window))
        .as[Seq[Int]].collect().toSeq
      val hof = df.select(graft.dedup.Dedup.winnowSelectedPositionsHof(col("gh"), window))
        .as[Seq[Int]].collect().toSeq
      kernel.zip(hof).zipWithIndex.foreach { case ((k, h), i) =>
        assert(k == h, s"window=$window array#$i=${arrays(i)}")
      }
    }
  }
}
