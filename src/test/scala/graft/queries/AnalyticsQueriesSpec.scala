package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants of the AnalyticsQueries wave, cross-checked
  * against brute-force recomputation on collected testdata — independent
  * of the DuckDB oracle (which mirrors the same SQL shape and could in
  * principle share a bug with it). */
class AnalyticsQueriesSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = AnalyticsQueries.queries(name)(spark, sf)

  test("q_skyline matches the brute-force strict-Pareto NOT EXISTS definition") {
    val parts = Tables.part(spark, sf)
      .selectExpr("p_brand", "p_partkey", "p_size",
        "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val expected = parts.filter { case (b, _, size, c) =>
      !parts.exists { case (b2, _, size2, c2) =>
        b2 == b && c2 <= c && size2 >= size && (c2 < c || size2 > size)
      }
    }.map(t => (t._1, t._2)).toSet
    val got = run("q_skyline").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected,
      s"skyline mismatch: extra=${got -- expected}, missing=${expected -- got}")
  }

  test("q_mad matches direct per-user upper-middle median and deviation median") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def upperMid(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val got = run("q_mad").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (u, med, mad, n) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val xs = ev(u)
      assert(n == xs.size)
      assert(med == upperMid(xs), s"user $u median")
      assert(mad == upperMid(xs.map(x => math.abs(x - med))), s"user $u mad")
    }
  }

  test("q_pagerank matches a driver-side replay of the fixed-point iteration") {
    val prRows = run("q_pagerank").collect()
      .map(r => (r.getInt(0), r.getLong(2))).toMap
    // rebuild edges + outdeg locally and replay the identical arithmetic
    val li = Tables.lineitem(spark, sf).selectExpr("l_orderkey", "l_suppkey")
    val o  = Tables.orders(spark, sf).selectExpr("o_orderkey", "o_custkey")
    val cu = Tables.customer(spark, sf).selectExpr("c_custkey", "c_nationkey")
    val su = Tables.supplier(spark, sf).selectExpr("s_suppkey", "s_nationkey")
    val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(cu, o("o_custkey") === cu("c_custkey"))
      .join(su, li("l_suppkey") === su("s_suppkey"))
      .selectExpr("c_nationkey AS src", "s_nationkey AS dst").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = Tables.nation(spark, sf).selectExpr("n_nationkey")
      .collect().map(_.getInt(0))
    var ranks = nodes.map(_ -> 1000000000000L).toMap
    for (_ <- 1 to 10) {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => ranks(s) / outdeg(s) }.sum).toMap
      ranks = nodes.map(n => n -> (150000000000L + in.getOrElse(n, 0L) * 85 / 100)).toMap
    }
    assert(prRows == ranks, "distributed fixed-point PageRank != driver replay")
  }

  test("q_gap_fill spine is contiguous per user, filled is never null, gaps carry the last value") {
    val rows = run("q_gap_fill").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      val days = sorted.map(_._2)
      assert(days.head + days.size - 1 == days.last, s"user $u spine has holes")
      // first day of the spine is an observation by construction
      assert(!sorted.head._4, s"user $u starts with a gap")
      sorted.sliding(2).foreach {
        case Array((_, _, prev, _), (_, d, filled, isGap)) =>
          if (isGap) assert(filled == prev, s"user $u day $d LOCF broke")
        case _ =>
      }
    }
  }

  test("q_linreg reproduces the closed-form OLS on collected data") {
    val data = Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag", "CAST(l_quantity AS BIGINT) AS x",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    run("q_linreg").collect().foreach { r =>
      val xs = data(r.getString(0))
      val n = xs.size.toDouble
      val (sx, sy) = (xs.map(_._2).sum.toDouble, xs.map(_._3).sum.toDouble)
      val sxy = xs.map(t => BigInt(t._2) * BigInt(t._3)).sum.toDouble
      val sxx = xs.map(t => BigInt(t._2) * BigInt(t._2)).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      assert(math.abs(r.getDouble(2) - slope) < 1e-4, s"${r.getString(0)} slope")
      assert(math.abs(r.getDouble(3) - intercept) < 1e-2, s"${r.getString(0)} intercept")
      val r2 = r.getDouble(4)
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("q_skew_stats is near zero skewness for the symmetric-uniform quantity column") {
    // quantity is ~uniform on [1, 50] per flag: skewness ≈ 0, excess
    // kurtosis ≈ −1.2 (uniform). Loose bands — this is a sanity check of
    // the moment algebra, not of the data generator.
    run("q_skew_stats").collect().foreach { r =>
      assert(math.abs(r.getDouble(3)) < 0.2, s"${r.getString(0)} skewness ${r.getDouble(3)}")
      assert(r.getDouble(4) > -1.5 && r.getDouble(4) < -0.8,
        s"${r.getString(0)} kurtosis ${r.getDouble(4)}")
    }
  }

  test("q_mode picks the true per-user maximum with the smallest-type tiebreak") {
    val counts = Tables.events(spark, sf)
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    run("q_mode").collect().foreach { r =>
      val (u, ty, n) = (r.getLong(0), r.getString(1), r.getLong(2))
      val best = counts(u).map(t => (t._3, t._2)).sortBy(t => (-t._1, t._2)).head
      assert((n, ty) == best, s"user $u mode")
    }
  }

  test("q_entropy is 0 for single-type users and bounded by ln(5)") {
    val rows = run("q_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(2)
      assert(h >= 0.0 && h <= math.log(5.0) + 1e-9, s"user ${r.getLong(0)} H=$h")
    }
  }

  test("q_grouping_sets contains exactly the three sets and they reconcile") {
    val rows = run("q_grouping_sets").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getInt(2), r.getInt(3), r.getLong(4)))
    val detail  = rows.filter(t => t._3 == 0 && t._4 == 0)
    val byFlag  = rows.filter(t => t._3 == 0 && t._4 == 1)
    val byStat  = rows.filter(t => t._3 == 1 && t._4 == 0)
    assert(rows.length == detail.length + byFlag.length + byStat.length,
      "unexpected grouping-id combination (grand total should be absent)")
    val total = detail.map(_._5).sum
    assert(byFlag.map(_._5).sum == total && byStat.map(_._5).sum == total,
      "subtotal rows do not reconcile with the detail set")
  }

  test("q_listagg emits at most 10 names and all of them when a nation has fewer") {
    run("q_listagg").collect().foreach { r =>
      val n = r.getLong(1)
      val names = r.getString(2).split(",")
      assert(names.length == math.min(n, 10L).toInt, s"${r.getString(0)}")
    }
  }

  test("q_pmi matches a brute-force tokenize/df/pair recount") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val docWords = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSet
    }
    val n = docs.length
    val df = docWords.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
      .filter { case (_, c) => c.toDouble >= 0.05 * n.toDouble }
    val pairCounts = docWords.flatMap { case (_, ws) =>
      val vs = ws.filter(df.contains).toSeq.sorted
      for (i <- vs.indices; j <- i + 1 until vs.size) yield (vs(i), vs(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
      .filter(_._2 >= 10)
    val got = run("q_pmi").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == pairCounts.map { case (k, v) => (k, v.toLong) },
      s"pair-count mismatch (got ${got.size}, expected ${pairCounts.size})")
  }

  test("q_ab_test counts reconcile and the z-score matches the closed form") {
    val r = run("q_ab_test").collect().head
    val (na, nb, ca, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na > 0 && nb > 0 && ca >= 0 && cb >= 0 && ca <= na && cb <= nb)
    val (dna, dnb, dca, dcb) = (na.toDouble, nb.toDouble, ca.toDouble, cb.toDouble)
    val (pa, pb) = (dca / dna, dcb / dnb)
    val pc = (dca + dcb) / (dna + dnb)
    assert(pc > 0.0 && pc < 1.0, "degenerate conversion split in testdata")
    val z = (pb - pa) / math.sqrt(pc * (1 - pc) * (1 / dna + 1 / dnb))
    assert(math.abs(r.getDouble(6) - z) < 1e-5)
  }

  test("q_attribution credits every purchase exactly once and matches a replay") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_id", "event_type",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
      var lastChannel = "direct"
      sorted.flatMap { r =>
        val out = if (r._4 == "purchase") Some((lastChannel, r._5)) else None
        if (r._4 != "purchase") lastChannel = r._4
        out
      }
    }.groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val got = run("q_attribution").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("q_percentiles picks the exact lower-element order statistics") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    run("q_percentiles").collect().foreach { r =>
      val xs = ev(r.getLong(0))
      def pick(p: Double) = xs(math.floor(p * (xs.size - 1)).toInt)
      assert(r.getLong(1) == xs.size)
      assert(r.getLong(2) == pick(0.25) && r.getLong(3) == pick(0.50)
        && r.getLong(4) == pick(0.75) && r.getLong(5) == pick(0.90),
        s"user ${r.getLong(0)}")
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4)
        && r.getLong(4) <= r.getLong(5))
    }
  }

  test("q_chisq covers the full label grid and matches a driver-side replay") {
    val counts = Tables.documents(spark, sf).groupBy("lang", "source").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val langs = counts.keySet.map(_._1)
    val sources = counts.keySet.map(_._2)
    val rows = run("q_chisq").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(4), r.getLong(5))))
    assert(rows.length == langs.size * sources.size, "grid not the full cross product")
    val n = counts.values.sum.toDouble
    val rowt = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colt = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    var total = 0L
    val expected = (for (l <- langs; sr <- sources) yield {
      val o = counts.getOrElse((l, sr), 0L)
      val e = rowt(l).toDouble * colt(sr).toDouble / n
      val d = o.toDouble - e
      val micro = math.floor(d * d / e * 1000000.0 + 0.5).toLong
      total += micro
      (l, sr) -> (o, micro)
    }).toMap
    rows.foreach { case (k, (o, micro, tot)) =>
      assert((o, micro) == expected(k), s"cell $k")
      assert(tot == total, "chi2 total is not the exact micro-unit sum")
    }
  }

  test("q_triangles matches a brute-force triangle enumeration") {
    val edges = Tables.lineitem(spark, sf).selectExpr("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf).selectExpr("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf).selectExpr("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .selectExpr("least(c_nationkey, s_nationkey) AS lo",
        "greatest(c_nationkey, s_nationkey) AS hi")
      .filter(col("lo") =!= col("hi")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expected = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    for {
      i <- nodes; j <- nodes if i < j && edges((i, j))
      k <- nodes if j < k && edges((j, k)) && edges((i, k))
    } { expected(i) += 1; expected(j) += 1; expected(k) += 1 }
    val got = run("q_triangles").collect()
      .map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(got == expected.toMap, s"got $got expected $expected")
  }

  test("q_stratified_sample: exactly min(k, |stratum|) rows per lang, drawn by hash rank") {
    val perLang = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val rows = run("q_stratified_sample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.keySet == perLang.keySet)
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == math.min(perLang(lang), 50L).toInt, s"lang $lang size")
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq, s"lang $lang ranks")
    }
    // determinism: the same query on the same data returns the same set
    val again = run("q_stratified_sample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(again == rows.toSet)
  }

  test("q_histogram partitions the table: bin counts sum to |lineitem| and bounds nest") {
    val rows = run("q_histogram").collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (bin, lo, hi) = (r.getLong(0), r.getLong(3), r.getLong(4))
      assert(lo >= bin * 500000L && hi < (bin + 1) * 500000L && lo <= hi)
    }
  }
}
