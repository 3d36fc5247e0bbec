package graft.operators

import graft.SparkSuite

/** [[Relational.mergeUpsert]]: the four MERGE cases plus pass-through. */
class MergeUpsertSpec extends SparkSuite {
  import spark.implicits._

  test("update replaces, delete drops, insert lands, absent-delete no-ops, rest pass through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", "U"),   // update
      (3L, "x", "D"),    // delete (payload ignored)
      (9L, "i", "U"),    // insert
      (7L, "x", "D")     // delete of an absent key: no-op
    ).toDF("k", "v", "op")
    val got = Relational.mergeUpsert(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (9L, "i")))
  }

  test("empty changeset is the identity") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val none = Seq.empty[(Long, String, String)].toDF("k", "v", "op")
    val got = Relational.mergeUpsert(base, none, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }
}
