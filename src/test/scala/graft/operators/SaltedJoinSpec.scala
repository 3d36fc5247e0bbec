package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SaltedJoinSpec extends SparkSuite {

  test("salted join returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 10k rows all sharing one hot key + a long tail
    val big = ((1 to 10000).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "payload")
    val small = (1 to 200).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Relational.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
