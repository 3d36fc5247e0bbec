package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The winnowing contract (Schleimer et al. SIGMOD'03): selection density,
  * the shared-run guarantee, and the rightmost tie rule. */
class WinnowingSpec extends SparkSuite {

  private val gram = 3
  private val win = 4

  private def selectedHashes(texts: Seq[String]): Seq[Set[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .withColumn("gh", Dedup.gramPolyHashes(col("text"), gram))
      .withColumn("ps", Dedup.winnowSelectedPositions(col("gh"), win))
      .select(col("gh"), col("ps"))
      .collect()
      .map { r =>
        val gh = r.getSeq[Long](0)
        if (gh.isEmpty) Set.empty[Long]
        else r.getSeq[Int](1).map(p => gh(p - 1)).toSet
      }
      .toSeq
  }

  test("shared runs of >= window+gram-1 tokens yield a shared fingerprint") {
    // 6-token shared run (win+gram-1 = 6) embedded in different contexts
    val shared = "alpha beta gamma delta epsilon zeta"
    val a = s"one two three $shared four five six"
    val b = s"seven eight $shared nine ten eleven twelve"
    val Seq(fa, fb) = selectedHashes(Seq(a, b))
    assert((fa intersect fb).nonEmpty,
      "documents sharing a full winnow-guarantee run selected no common fingerprint")
  }

  test("selection keeps a fraction of positions, never zero for non-empty docs") {
    val doc = (1 to 200).map(i => s"tok${i % 97}").mkString(" ")
    import spark.implicits._
    val row = Seq(doc).toDF("text")
      .withColumn("gh", Dedup.gramPolyHashes(col("text"), gram))
      .withColumn("w", Dedup.winnowFromHashes(col("gh"), win))
      .select(col("w.n_fp"), size(col("gh"))).collect().head
    val (nFp, m) = (row.getInt(0), row.getInt(1))
    assert(m == 198)
    assert(nFp > 0 && nFp < m, s"expected 0 < n_fp < $m, got $nFp")
    // density ~2/(w+1) = 0.4; allow generous slack for structured input
    assert(nFp <= m * 0.7, s"selection too dense: $nFp of $m")
  }

  test("all-equal hashes select the rightmost position of every window") {
    // identical tokens → every gram hash equal → window j keeps j+win-1
    val doc = Seq.fill(9)("same").mkString(" ") // m = 7 grams, windows 1..4
    import spark.implicits._
    val r = Seq(doc).toDF("text")
      .withColumn("gh", Dedup.gramPolyHashes(col("text"), gram))
      .select(Dedup.winnowSelectedPositions(col("gh"), win))
      .collect().head.getSeq[Int](0).toSet
    assert(r == Set(4, 5, 6, 7), s"expected rightmost picks {4,5,6,7}, got $r")
  }

  test("short and empty documents are safe") {
    import spark.implicits._
    val rows = Seq("", "one two", "one two three four").toDF("text")
      .withColumn("gh", Dedup.gramPolyHashes(col("text"), gram))
      .withColumn("w", Dedup.winnowFromHashes(col("gh"), win))
      .select(col("w.n_fp"), col("w.digest")).collect()
    assert(rows(0).getInt(0) == 0 && rows(0).getLong(1) == 0L) // no tokens
    assert(rows(1).getInt(0) == 0 && rows(1).getLong(1) == 0L) // < gram tokens
    assert(rows(2).getInt(0) == 1) // 2 grams < window → one truncated window
  }
}
