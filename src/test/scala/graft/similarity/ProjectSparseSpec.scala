package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The Achlioptas sparse-projection contract: entry law, determinism,
  * linearity of the integer matvec. */
class ProjectSparseSpec extends SparkSuite {

  test("matrix entries follow the 1/6, 2/3, 1/6 law and are deterministic") {
    val m = Similarity.achlioptasMatrix(16, 64)
    assert(m == Similarity.achlioptasMatrix(16, 64))
    val flat = m.flatten
    assert(flat.forall(v => v == -1 || v == 0 || v == 1))
    val n = flat.size.toDouble
    val fracZero = flat.count(_ == 0) / n
    val fracNeg = flat.count(_ == -1) / n
    val fracPos = flat.count(_ == 1) / n
    assert(math.abs(fracZero - 2.0 / 3) < 0.05, s"zero fraction $fracZero")
    assert(math.abs(fracNeg - 1.0 / 6) < 0.04, s"-1 fraction $fracNeg")
    assert(math.abs(fracPos - 1.0 / 6) < 0.04, s"+1 fraction $fracPos")
  }

  test("projection is the exact integer matvec (checked against a Scala mirror)") {
    import spark.implicits._
    val d = 64
    val k = 16
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(20)(Seq.fill(d)(rnd.nextInt(255) - 127))
    val m = Similarity.achlioptasMatrix(k, d)
    val expected = vecs.map(v => (0 until k).map(j =>
      (0 until d).map(i => v(i).toLong * m(j)(i)).sum))
    val got = vecs.toDF("q")
      .select(Similarity.projectSparse(col("q"), k, d).as("y"))
      .collect().map(_.getSeq[Long](0).toIndexedSeq).toSeq
    assert(got == expected)
  }

  test("projection is linear: P(a+b) = P(a) + P(b)") {
    import spark.implicits._
    val d = 64
    val k = 16
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(d)(rnd.nextInt(100) - 50)
    val b = Seq.fill(d)(rnd.nextInt(100) - 50)
    val sum = a.zip(b).map { case (x, y) => x + y }
    val rows = Seq(a, b, sum).toDF("q")
      .select(Similarity.projectSparse(col("q"), k, d).as("y"))
      .collect().map(_.getSeq[Long](0).toIndexedSeq)
    assert(rows(0).zip(rows(1)).map { case (x, y) => x + y } == rows(2))
  }
}
