package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The z-order layout's data-skipping claim, asserted from the file
  * footers it actually produces: for a point predicate on a key, a
  * parquet reader can skip every file whose [min, max] range of that key
  * does not straddle the value — so the fraction of straddling files IS
  * the fraction of the table a selective scan must touch. A single-key
  * sort skips only on its leading key (every file straddles the other
  * key); the Morton layout skips on BOTH. */
class ZOrderSpec extends SparkSuite {

  private def straddleFraction(path: String, key: String, v: Long): Double = {
    val byFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(key)).as("lo"), max(col(key)).as("hi"))
    val total = byFile.count().toDouble
    byFile.filter(col("lo") <= v && col("hi") >= v).count() / total
  }

  test("z-clustered files skip on BOTH keys; a single-key sort skips on one") {
    val li = graft.queries.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val zDir = graft.core.TempDirs.create("graft_zorder_").toAbsolutePath.toString
    val pDir = graft.core.TempDirs.create("graft_psort_").toAbsolutePath.toString
    ZOrder.clusterWrite(li, "l_partkey", "l_suppkey", zDir, files = 32)
    li.repartitionByRange(32, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(pDir)

    // mid-range point values on each dimension, derived from the data
    val mids = li.agg(
      floor((min(col("l_partkey")) + max(col("l_partkey"))) / 2).cast("long"),
      floor((min(col("l_suppkey")) + max(col("l_suppkey"))) / 2).cast("long")).head()
    val (pv, sv) = (mids.getLong(0), mids.getLong(1))
    val zPart = straddleFraction(zDir, "l_partkey", pv)
    val zSupp = straddleFraction(zDir, "l_suppkey", sv)
    val pPart = straddleFraction(pDir, "l_partkey", pv)
    val pSupp = straddleFraction(pDir, "l_suppkey", sv)

    // the partkey-sorted layout is near-perfect on partkey but useless
    // on suppkey (every file spans the whole suppkey range)
    assert(pPart <= 0.15, s"partkey-sorted straddle on partkey = $pPart")
    assert(pSupp >= 0.9, s"partkey-sorted straddle on suppkey = $pSupp")
    // the z-clustered layout skips MOST files on either dimension —
    // the multi-dimensional trade: not as sharp as a dedicated sort on
    // its own key, far better than the other layout's nothing
    assert(zPart <= 0.6, s"z-clustered straddle on partkey = $zPart")
    assert(zSupp <= 0.6, s"z-clustered straddle on suppkey = $zSupp")
    assert(zSupp < pSupp / 1.5, s"z ($zSupp) must beat single-key sort ($pSupp) on the second key")
  }

  test("clusterWrite on an empty or all-NULL-key input gets a directed error") {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_zorder_empty_").toAbsolutePath.toString
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val errEmpty = intercept[IllegalArgumentException] {
      ZOrder.clusterWrite(empty, "x", "y", dir, files = 4)
    }
    assert(errEmpty.getMessage.contains("max(x, y) is NULL"))
    val nullY = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long])).toDF("x", "y")
    val errNull = intercept[IllegalArgumentException] {
      ZOrder.clusterWrite(nullY, "x", "y", dir, files = 4)
    }
    assert(errNull.getMessage.contains("max(y) is NULL"))
  }

  test("zindex matches a reference interleave: narrow lanes left-aligned, wide lanes high-bit") {
    def ref(x: Long, y: Long, bx: Int, by: Int): Long = {
      def lane(v: Long, b: Int): Long =
        if (b <= 16) (v % (1L << b)) << (16 - b) else (v % (1L << b)) >> (b - 16)
      val (xa, ya) = (lane(x, bx), lane(y, by))
      (0 until 16).map(i => ((xa >> i) & 1L) << (2 * i) |
        ((ya >> i) & 1L) << (2 * i + 1)).reduce(_ | _)
    }
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (65536L, 1L), (19999L, 999L),
      (25020000L, 250999L), (1L << 40, (1L << 33) + 12345L))
    for ((bx, by) <- Seq((16, 16), (15, 10), (1, 16), (25, 18), (41, 34))) {
      val got = pairs.toDF("x", "y")
        .select(col("x"), col("y"), ZOrder.zindex(col("x"), col("y"), bx, by).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      pairs.foreach { case (x, y) =>
        assert(got((x, y)) == ref(x, y, bx, by), s"zindex($x, $y, $bx, $by)")
      }
    }
    assert(ZOrder.bitsFor(0) == 1 && ZOrder.bitsFor(1) == 1 &&
      ZOrder.bitsFor(2) == 2 && ZOrder.bitsFor(999) == 10 &&
      ZOrder.bitsFor(19999) == 15 && ZOrder.bitsFor(1L << 40) == 41 &&
      ZOrder.bitsFor(25020000L) == 25 &&
      ZOrder.bitsFor((1L << 62) - 1) == 62)
    // >= 2^62 is REFUSED, not clamped: a clamp would pmod away the key's
    // TOP bit (2^62+k clustering next to k — silent wraparound)
    for (bad <- Seq(1L << 62, Long.MaxValue)) {
      val e = intercept[IllegalArgumentException] { ZOrder.bitsFor(bad) }
      assert(e.getMessage.contains("2^62") && e.getMessage.contains("rescale"))
    }
  }

  test("wide-domain keys keep high-bit locality: no low-16-bit wraparound") {
    // 26 copy-islands at 10^6 partkey spacing (the 26x sweep geometry):
    // under the old `% 65536` lanes the islands wrap pseudo-randomly and
    // island order is destroyed; high-bit lanes keep zindex monotone in
    // the island index when the other key is fixed
    import spark.implicits._
    val islands = (0 until 26).map(c => (c.toLong * 1000000L + 10000L, 500L))
    val bx = ZOrder.bitsFor(islands.map(_._1).max)
    val by = ZOrder.bitsFor(500L)
    val zs = islands.toDF("x", "y")
      .select(ZOrder.zindex(col("x"), col("y"), bx, by).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zs == zs.sorted,
      s"zindex not monotone across copy-islands at fixed y: $zs")
  }
}
