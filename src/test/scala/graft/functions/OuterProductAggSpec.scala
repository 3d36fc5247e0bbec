package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Integer-exactness and merge-order independence of the co-moment
  * accumulator — the properties the covariance oracle depends on. */
class OuterProductAggSpec extends AnyFunSuite {

  private def runChunks(agg: OuterProductAgg, chunks: Seq[Seq[Seq[Int]]]): Seq[Long] = {
    val partials = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    agg.finish(partials.reduce(agg.merge))
  }

  test("known 2-dim example: co-moments, sums, count") {
    val agg = new OuterProductAgg(2)
    val vs = Seq(Seq(1, 2), Seq(3, -1))
    val r = agg.finish(vs.foldLeft(agg.zero)(agg.reduce))
    // layout: [s11, s12, s21, s22, sum1, sum2, n]
    assert(r == Seq(10L, -1L, -1L, 5L, 4L, 1L, 2L))
  }

  test("any chunking/merge order yields the identical buffer") {
    val d = 8
    val agg = new OuterProductAgg(d)
    val rnd = new Random(7)
    val vs = Seq.fill(200)(Seq.fill(d)(rnd.nextInt(255) - 127))
    val whole = runChunks(agg, Seq(vs))
    for (parts <- Seq(2, 3, 7)) {
      val chunked = runChunks(agg, vs.grouped(vs.size / parts).toSeq)
      assert(chunked == whole, s"$parts-way chunking diverged")
    }
    // reversed input order too — integer adds commute
    assert(runChunks(agg, Seq(vs.reverse)) == whole)
  }

  test("dimension mismatch fails loudly") {
    val agg = new OuterProductAgg(4)
    intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, Seq(1, 2, 3))
    }
  }
}
