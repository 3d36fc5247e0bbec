package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words about spark engines and queries"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "tiny")) // < n tokens
    .toDF("doc_id", "text")

  test("exactDupGroups groups identical texts under the min id") {
    val out = Dedup.exactDupGroups(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out.contains((1L, 2L))) // keeper 1, two copies
    assert(out.count(_._2 == 1L) == 3)
  }

  test("wordNgrams builds distinct order-sensitive shingles; short docs empty") {
    val out = docs.select(col("doc_id"), Dedup.wordNgrams(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).contains("the quick brown"))
    assert(out(1L).length == 7) // 9 tokens → 7 trigrams
    assert(out(5L).isEmpty)
  }

  test("decontaminateBloom equals decontaminate exactly, even at absurd fpp") {
    // bench = docs 1 and 5; training docs 2 and 4 share 4-grams with doc 1
    // → dropped; doc 3 survives. The Bloom prefilter must not change the
    // result at any fpp: false positives are verified away in stage 2,
    // false negatives cannot exist. fpp=0.5 forces a tiny, collision-heavy
    // filter, the worst case for the prefilter.
    val bench = docs.filter(col("doc_id").isin(1L, 5L))
    val train = docs.filter(!col("doc_id").isin(1L, 5L))
    val exact = Dedup.decontaminate(
      train, col("doc_id"), col("text"), bench, col("text"), n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact == Set(3L))
    for (fpp <- Seq(0.5, 0.01)) {
      val bloom = Dedup.decontaminateBloom(
        train, col("doc_id"), col("text"), bench, col("text"), n = 4, fpp = fpp)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(bloom == exact, s"fpp=$fpp diverged from the exact decontamination")
    }
    intercept[IllegalArgumentException] {
      Dedup.decontaminateBloom(
        train, col("doc_id"), col("text"), bench, col("text"), n = 4, fpp = 1.5)
    }
  }

  test("contaminationStats grades overlap; its frac>0 slice IS decontaminate's drop set") {
    val bench = docs.filter(col("doc_id").isin(1L, 5L))
    val train = docs.filter(!col("doc_id").isin(1L, 5L))
    val stats = Dedup.contaminationStats(
        train, col("doc_id"), col("text"), bench, col("text"), n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(stats.keySet == Set(2L, 3L, 4L), "one row per training doc, always")
    // docs 2 and 4 share 4-grams with bench doc 1; doc 3 is clean
    assert(stats(3L)._2 == 0L && stats(3L)._3 == 0.0)
    assert(stats(2L)._2 > 0L && stats(2L)._3 > 0.0 && stats(2L)._3 <= 1.0)
    assert(stats(4L)._2 > 0L)
    // graded report ⊃ binary guard: frac == 0 survivors match decontaminate
    val survivors = Dedup.decontaminate(
        train, col("doc_id"), col("text"), bench, col("text"), n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stats.filter(_._2._3 == 0.0).keySet == survivors)
    // a doc shorter than n tokens reports 0 grams, not a null or a crash
    assert(stats(4L)._1 > 0L)
  }

  test("ngramJaccardPairs finds near-dups and exact dups with correct jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, maxDf = 10, minJaccard = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(pairs((1L, 4L)) == 1.0) // exact duplicate
    assert(pairs((1L, 2L)) > 0.5 && pairs((1L, 2L)) < 1.0) // near-dup
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhashNearDupPairs: exact recall within maxHamming, none beyond, exact distances") {
    import spark.implicits._
    // hand-built fingerprints: 1-2 at hamming 1, 1-3 at hamming 2 (beyond
    // the bound), 4 far away; block-banding must find exactly {1,2} plus
    // the identical pair {5,6}
    val fps = Seq(
      (1L, 0x000000FFL), (2L, 0x000000FEL), (3L, 0x000000FCL),
      (4L, 0x7FFF0000L), (5L, 0x12345678L), (6L, 0x12345678L))
      .toDF("doc_id", "simhash")
    val got = Dedup.simhashNearDupPairs(fps, bits = 32, maxHamming = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got == Map((1L, 2L) -> 1, (5L, 6L) -> 0, (2L, 3L) -> 1), s"got $got")
    // widening the bound to 3 (4 x 8-bit blocks) must pull in (1,3) at
    // distance 2 — pigeonhole recall is exact, not probabilistic
    val wide = Dedup.simhashNearDupPairs(fps, bits = 32, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(wide((1L, 3L)) == 2 && wide((1L, 2L)) == 1)
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(fps, bits = 32, maxHamming = 4) // 5 does not tile 32
    }
  }

  test("sparseTfidfPairs: exact dups at sim 1.0, near-dups high, disjoint docs absent") {
    // maxDfDivisor 1 → cap = max(5/1, 20) = 20: nothing pruned in this
    // tiny fixture, so the pairing is pure tf-idf cosine
    val pairs = Dedup.sparseTfidfPairs(docs, col("doc_id"), col("text"),
        maxDfDivisor = 1, minSim = 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 4L)) == 1.0, "identical docs must hit cosine 1.0 exactly")
    assert(pairs((1L, 2L)) > 0.5 && pairs((1L, 2L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "docs sharing no token must produce no pair")
    assert(!pairs.keySet.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("sparseTfidfPairs df cap prunes ubiquitous tokens") {
    // 30 docs all sharing token "common"; docs 0 and 1 also share "rare".
    // With the cap at max(30/10, 20) = 20 < 30, "common" is pruned and only
    // the rare-token pair survives.
    val many = (0L until 30L).map(i =>
      (i, if (i < 2) s"common rare u$i" else s"common u$i")).toDF("doc_id", "text")
    val pairs = Dedup.sparseTfidfPairs(many, col("doc_id"), col("text"),
        maxDfDivisor = 10, minSim = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)),
      s"only the rare-token pair should survive the df cap, got $pairs")
  }

  test("minhash signatures: identical docs identical; similar docs mostly agree") {
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), n = 3, numPerms = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(4L))
    val agree12 = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b } / 32.0
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } / 32.0
    assert(agree12 > agree13) // minhash agreement tracks jaccard
    assert(!sigs.contains(5L)) // no shingles → dropped
  }

  test("minhash LSH banding surfaces the exact-dup pair") {
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), n = 3, numPerms = 32)
    val cands = Dedup.minhashLshCandidates(sigs, numPerms = 32, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = cands.find(c => c._1 == 1L && c._2 == 4L)
    assert(exact.exists(_._3 == 8L)) // identical signature → all 8 bands shared
  }

  test("portable minhash: column polyHash matches the Scala twin; dups collide in every band") {
    import graft.functions.PortableHash
    // the column fold and the Scala twin agree on real shingles
    val shingles = docs.select(explode(Dedup.wordNgrams(col("text"), 3)).as("s"))
      .select(col("s"), PortableHash.polyHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(shingles.nonEmpty)
    shingles.foreach { case (s, h) =>
      assert(h == PortableHash.polyHashScala(s), s"polyHash mismatch on '$s'")
      assert(h >= 0 && h < PortableHash.P)
    }
    // exact dups (docs 1 and 4) have identical signatures -> share all 8 bands
    val sigs = Dedup.minhashSignaturesPortable(docs, col("doc_id"), col("text"),
      n = 3, numPerms = 32)
    val byDoc = sigs.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byDoc(1L) == byDoc(4L))
    assert(byDoc(1L) != byDoc(3L))
    val cands = Dedup.minhashBandCandidatesExact(sigs, numPerms = 32, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cands((1L, 4L)) == 8L, "exact dup must share all 8 bands")
  }

  test("portable simhash: dups equal, near-dups closer than unrelated, bounds respected") {
    val fp = Dedup.simhashPortable(docs, col("doc_id"), col("text"), bits = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(4L)) // exact dup
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(2L)) < hamming(fp(1L), fp(3L)),
      "near-dup must be closer in hamming than an unrelated doc")
    fp.values.foreach(v => assert(v >= 0 && v < (1L << 32)))
    intercept[IllegalArgumentException] {
      Dedup.simhashPortable(docs, col("doc_id"), col("text"), bits = 63)
    }
  }

  test("simhash: exact dups equal; near-dups closer in hamming than unrelated") {
    val fps = Dedup.simhash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(1L) == fps(4L))
    assert(ham(fps(1L), fps(2L)) < ham(fps(1L), fps(3L)))
  }

  test("native SimHash64 kernel matches the composed-HOF formulation on real docs") {
    val real = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaKernel = Dedup.simhash(real, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaHof = Dedup.simhashHof(real, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel == viaHof)
    assert(viaKernel.nonEmpty)
  }

  test("connected components: chain, triangle, and isolated pair resolve to min ids") {
    import spark.implicits._
    // component {1,2,3,4} as a path (diameter 3 — exercises iteration),
    // component {10,11,12} as a triangle, component {20,21} as one edge
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
    assert(comp.size == 9)
  }

  test("connected components: long path needs multiple propagation rounds") {
    import spark.implicits._
    val n = 30 // path 0-1-2-...-30, diameter 30
    val pairs = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    // driverMaxPairs = 0 forces the distributed iterative path
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b",
        maxIter = 40, driverMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.forall(_ == 0L))
    assert(comp.size == n + 1)
  }

  test("distributed CC fails loudly instead of returning unconverged labels") {
    import spark.implicits._
    val pairs = (0 until 30).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter = 2, driverMaxPairs = 0L)
    }
    assert(ex.getMessage.contains("converge"))
  }

  test("driver union-find and distributed propagation agree on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pairs = Seq.tabulate(200)(_ =>
        (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (x, y) => x != y }
      .map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .distinct.toDF("id_a", "id_b")
    val viaDriver = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDistributed = Dedup.connectedComponents(pairs, "id_a", "id_b",
        driverMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaDistributed)
    assert(viaDriver.nonEmpty)
  }

  test("cleanCorpusPipeline equals the composed form and shares one materialized pair stage") {
    val d = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val p = Dedup.cleanCorpusPipeline(d, col("doc_id"), col("text"),
      n = 3, maxDf = 10, minJaccard = 0.05)

    // products agree with the independently composed builders
    val composedPairs = Dedup.ngramJaccardPairs(d, col("doc_id"), col("text"),
        n = 3, maxDf = 10, minJaccard = 0.05)
    val composedGroups = Dedup.connectedComponents(composedPairs, "id_a", "id_b")
    assert(p.pairs.collect().map(_.toSeq).toSet == composedPairs.collect().map(_.toSeq).toSet)
    assert(p.groups.collect().map(_.toSeq).toSet == composedGroups.collect().map(_.toSeq).toSet)

    // cleaned matches the driver query's composed formulation exactly
    val viaQuery = graft.queries.TextQueries.queries("q_clean_corpus")(
      spark, "/root/testdata/sf0.001")
    assert(p.cleaned.collect().map(_.getLong(0)).toSet ==
      viaQuery.collect().map(_.getLong(0)).toSet)

    // the sharing contract: groups and cleaned read the checkpointed pair
    // list, not the shingle pipeline — no shingle-stage node (the explode
    // over the shingle kernel) may appear in either consumer's plan
    for (consumer <- Seq(p.groups, p.cleaned)) {
      val plan = consumer.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("shingle"), plan.take(500))
      assert(!plan.contains("generate explode"), plan.take(500))
    }
    Dedup.unpersistAll()
  }

  test("sourceOverlap: exact pair counts and Jaccard; gramless sources absent") {
    val byeSource = Seq(
      ("A", "a b c d"),  // grams {a b c, b c d}
      ("A", "a b c"),    // adds nothing: distinct per source
      ("B", "b c d e"),  // grams {b c d, c d e} — shares {b c d} with A
      ("C", "x y")       // < 3 tokens: no grams, source must not appear
    ).toDF("source", "text")
    val got = Dedup.sourceOverlap(byeSource, col("source"), col("text"), n = 3)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    assert(got == List(("A", "B", 1L, 2L, 2L, 0.3333)))
    Dedup.unpersistAll()
  }

  test("sourceOverlap rejects a non-positive shingle size") {
    intercept[IllegalArgumentException] {
      Dedup.sourceOverlap(docs.withColumn("source", lit("s")),
        col("source"), col("text"), n = 0)
    }
  }
}
