package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** q_split_groupaware: the leakage guarantee — no near-dup family may
  * straddle folds — checked directly against the pair set. */
class GroupAwareSplitSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.01"

  test("every near-dup pair lands in the same fold; folds partition the corpus") {
    val split = TextQueries.queries("q_split_groupaware")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val docs = Tables.documents(spark, sfDir)
    assert(split.size == docs.count(), "every document must receive a fold")
    assert(split.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // the actual leakage check: both ends of every candidate pair share
    // a group AND a fold
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, maxDf = 10, minJaccard = 0.05)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "testdata must contain near-dup pairs for this spec to bite")
    pairs.foreach { case (a, b) =>
      assert(split(a)._1 == split(b)._1, s"pair ($a,$b) in different groups")
      assert(split(a)._2 == split(b)._2, s"LEAK: pair ($a,$b) straddles folds")
    }
  }
}
