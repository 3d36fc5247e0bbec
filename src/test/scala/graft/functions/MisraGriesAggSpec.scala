package graft.functions

import scala.collection.mutable
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** The Misra-Gries guarantees under arbitrary merge trees — the property
  * Spark's partial aggregation relies on (map-side partials merged in
  * nondeterministic order). Pure aggregator-level tests; the Spark-side
  * execution is exercised end-to-end by q_frequent_words. */
class MisraGriesAggSpec extends AnyFunSuite {

  /** Zipf-ish stream: item i appears ~ n/(i+1) times, shuffled. */
  private def zipfStream(nItems: Int, scale: Int, seed: Int): Seq[String] = {
    val r = new Random(seed)
    val items = (0 until nItems).flatMap(i => Seq.fill(scale / (i + 1))(s"item$i"))
    r.shuffle(items)
  }

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** Run the aggregator over `chunks` with a random binary merge tree. */
  private def runMerged(agg: MisraGriesAgg, chunks: Seq[Seq[String]], seed: Int): Map[String, Long] = {
    val r = new Random(seed)
    val partials = mutable.ArrayBuffer(chunks.map(c => c.foldLeft(agg.zero)(agg.reduce)): _*)
    while (partials.size > 1) {
      val i = r.nextInt(partials.size)
      val a = partials.remove(i)
      val j = r.nextInt(partials.size)
      val b = partials.remove(j)
      partials.insert(r.nextInt(partials.size + 1), agg.merge(a, b))
    }
    agg.finish(partials.head)
  }

  test("containment and bound hold across random merge trees") {
    val k = 20
    val agg = new MisraGriesAgg(k)
    for (seed <- 1 to 5) {
      val xs = zipfStream(nItems = 200, scale = 2000, seed = seed)
      val n = xs.size.toLong
      val exact = exactCounts(xs)
      val chunkCount = 3 + seed
      val chunks = xs.grouped(math.max(1, xs.size / chunkCount)).toSeq
      val got = runMerged(agg, chunks, seed = seed * 7)
      assert(got.size <= k, s"summary exceeded $k counters: ${got.size}")
      val eps = n.toDouble / (k + 1)
      // (a) containment: every item above n/(k+1) holds a counter
      exact.foreach { case (item, c) =>
        if (c > eps) assert(got.contains(item),
          s"seed $seed: item $item (freq $c > $eps) missing from summary")
      }
      // (b) never overcounts; undercounts by at most n/(k+1)
      got.foreach { case (item, est) =>
        val c = exact.getOrElse(item, 0L)
        assert(est <= c, s"seed $seed: $item overcounted ($est > $c)")
        assert(c - est <= eps, s"seed $seed: $item undercount ${c - est} > $eps")
      }
    }
  }

  test("single-chunk reduce path matches the guarantees too") {
    val k = 5
    val agg = new MisraGriesAgg(k)
    val xs = Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ (1 to 30).map(i => s"junk$i")
    val got = agg.finish(new Random(1).shuffle(xs).foldLeft(agg.zero)(agg.reduce))
    val n = xs.size
    assert(got.contains("a") && got.contains("b")) // both far above n/(k+1)=20
    assert(got("a") <= 60 && 60 - got("a") <= n / (k + 1.0))
    assert(got.size <= k)
  }

  test("an exact-fitting stream (distinct items ≤ k) is counted exactly") {
    val agg = new MisraGriesAgg(10)
    val xs = Seq("x", "y", "x", "z", "x", "y")
    val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(got == Map("x" -> 3L, "y" -> 2L, "z" -> 1L))
  }
}
