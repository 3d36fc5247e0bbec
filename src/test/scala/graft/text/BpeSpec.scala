package graft.text

import graft.SparkSuite

class BpeSpec extends SparkSuite {
  import Bpe._

  // the Sennrich/ACL-2016 style toy corpus: BPE should learn frequent
  // subword units in frequency order with the (count DESC, pair ASC)
  // tiebreak
  private val toy = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainLocal learns the classic toy merges deterministically") {
    val m = trainLocal(toy, 4)
    // pair counts, iter 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, ... →
    // (e,s) wins the 9-tie by pair ASC; then (es,t)=9; then (l,o)=7 beats
    // (o,w)=7 by pair ASC; then (lo,w)=7
    assert(m == Seq(Merge("e", "s"), Merge("es", "t"), Merge("l", "o"), Merge("lo", "w")))
    // replay: "newest" → n,e,w,est ; "lowest" (unseen) → low,est
    assert(tokenize("newest", m) == IndexedSeq("n", "e", "w", "est"))
    assert(tokenize("lowest", m) == IndexedSeq("low", "est"))
  }

  test("greedy left-to-right application never chains a just-merged symbol") {
    // pair (a,a) over "aaaa": positions 1-2 merge, 3-4 merge — not 2-3
    assert(applyMerge(IndexedSeq("a", "a", "a"), "a", "a") == IndexedSeq("aa", "a"))
    assert(applyMerge(IndexedSeq("a", "a", "a", "a"), "a", "a") == IndexedSeq("aa", "aa"))
  }

  test("trainDistributed equals trainLocal on a real vocab slice") {
    import spark.implicits._
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val words = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "regexp_extract_all(text, '[A-Za-z]+', 0)")).as("word"))
      .groupBy("word").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("freq"))
    val local = trainLocal(
      words.collect().map(r => (r.getString(0), r.getLong(1))).toSeq, 12)
    val dist = trainDistributed(spark, words, 12)
    assert(dist == local)
    assert(local.size == 12)
  }

  test("training stops early when the vocab runs out of pairs") {
    val m = trainLocal(Seq(("ab", 3L)), 10)
    assert(m == Seq(Merge("a", "b"))) // one pair exists, then nothing
    assert(tokenize("ab", m) == IndexedSeq("ab"))
  }
}
