package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class CountMinSpec extends SparkSuite {
  import spark.implicits._

  // skewed keys: 1 appears 50x, 2 appears 10x, 3..22 once each
  private lazy val keys =
    (Seq.fill(50)(1L) ++ Seq.fill(10)(2L) ++ (3L to 22L)).toDF("k")
  private lazy val exact = keys.groupBy($"k").agg(count(lit(1)).as("n"))

  test("estimates never undercount, and are exact when width swamps the key space") {
    val items = exact.select($"k")
    val wide = CountMin.estimates(keys, $"k", width = 4096, depth = 4, items)
      .join(exact, $"item" === $"k")
      .select($"item", $"cms_est", $"n").collect()
    wide.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"width 4096 over 22 keys should be collision-free for key ${r.getLong(0)}")
    }
    // a deliberately tiny sketch still never undercounts
    val tiny = CountMin.estimates(keys, $"k", width = 4, depth = 2, items)
      .join(exact, $"item" === $"k")
      .select($"cms_est", $"n").collect()
    tiny.foreach(r => assert(r.getLong(0) >= r.getLong(1), "CMS undercounted"))
  }

  test("unseen keys estimate 0: empty buckets contribute 0, not a dropped row") {
    // keys far outside the data; with width 4096 over 22 distinct data keys
    // the chance all their buckets collide with data cells is nil, so the
    // point-query contract requires est = 0 — and the item must APPEAR
    val unseen = Seq(900001L, 900002L).toDF("k")
    val est = CountMin.estimates(keys, $"k", width = 4096, depth = 4, unseen)
      .orderBy($"item").collect()
    assert(est.length == 2, "unseen items must not vanish from the output")
    est.foreach(r => assert(r.getLong(1) == 0L,
      s"unseen key ${r.getLong(0)} estimated ${r.getLong(1)}, want 0"))
    // mixed seen+unseen: seen keys keep exact counts, unseen get 0
    val mixed = Seq(1L, 900001L).toDF("k")
    val m = CountMin.estimates(keys, $"k", width = 4096, depth = 4, mixed)
      .orderBy($"item").collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 50L), (900001L, 0L)))
  }

  test("counter table is bounded by depth*width cells and totals depth*N") {
    val ctrs = CountMin.counters(keys, $"k", width = 8, depth = 3).collect()
    assert(ctrs.length <= 3 * 8)
    assert(ctrs.map(_.getLong(2)).sum == 3L * 80) // every row lands once per hash row
    assert(ctrs.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
  }

  test("bucket arithmetic stays in range and rejects bad parameters") {
    // large keys: (P-1)*A must not overflow ANSI long arithmetic
    val big = Seq(Long.MaxValue, 2147483646L, 0L).toDF("k")
    val buckets = big.select(CountMin.bucket($"k", 0, 2048).as("b")).collect()
    buckets.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) < 2048))
    intercept[IllegalArgumentException] {
      CountMin.counters(keys, $"k", width = 0, depth = 2)
    }
    intercept[IllegalArgumentException] {
      CountMin.counters(keys, $"k", width = 8, depth = 99)
    }
  }
}
