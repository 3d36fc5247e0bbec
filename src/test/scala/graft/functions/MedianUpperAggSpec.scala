package graft.functions

import graft.SparkSuite

class MedianUpperAggSpec extends SparkSuite {
  import spark.implicits._

  test("typed Aggregator computes the reference's upper-middle median") {
    // even length: index n/2 (0-based) = upper of the two middles
    val ds = Seq(1.0, 9.0, 3.0, 7.0).toDS()
    assert(ds.select(MedianUpperAgg.column).head() == 7.0)
    // odd length: exact middle
    val odd = Seq(5.0, 1.0, 3.0).toDS()
    assert(odd.select(MedianUpperAgg.column).head() == 3.0)
    // grouped use
    val grouped = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0))
      .toDS().groupByKey(_._1).mapValues(_._2)
      .agg(MedianUpperAgg.toColumn)
      .collect().toMap
    assert(grouped == Map("a" -> 2.0, "b" -> 10.0))
  }

  test("streamRestamp and streamReduce on the typed surface") {
    import graft.core.Event
    import graft.core.StreamOps._
    val evs = Seq(
      Event.data(0L, (new java.sql.Timestamp(500L), 1)),
      Event.data(10L, (new java.sql.Timestamp(900L), 2))).toDS()
    val restamped = evs.streamRestamp(_._1).collect().toList
    assert(restamped.map(_.time.get.getTime) == List(500L, 900L))
    val ints = Seq(Event.data(0L, 3), Event.tick[Int](5L), Event.data(10L, 4)).toDS()
    assert(ints.streamReduce(_ + _).contains(7))
    assert(Seq.empty[Event[Int]].toDS().streamReduce(_ + _).isEmpty)
  }
}
