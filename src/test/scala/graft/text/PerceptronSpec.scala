package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Perceptron]]: the all-integer batch update rule and the feature map. */
class PerceptronSpec extends SparkSuite {

  private lazy val feats =
    Perceptron.features(graft.queries.Tables.documents(spark, "/root/testdata/sf0.001"))

  test("epoch 1 from w=0 updates on EVERY row (ties are errors)") {
    val w1 = Perceptron.train(feats, epochs = 1)
    val exact = feats.agg(
      sum(col("y") * col("x0")), sum(col("y") * col("x1")),
      sum(col("y") * col("x2")), sum(col("y") * col("x3")),
      sum(col("y") * col("x4"))).collect()(0)
    assert(w1.toSeq == (0 until 5).map(exact.getLong))
  }

  test("0 epochs keeps the zero vector; training is deterministic") {
    assert(Perceptron.train(feats, 0).toSeq == Seq.fill(5)(0L))
    assert(Perceptron.train(feats, 3).toSeq == Perceptron.train(feats, 3).toSeq)
  }

  test("features are integer counts with a ±1 label") {
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L || r.getLong(1) == -1L)
      assert(r.getLong(2) == 1L)                      // bias
      assert((3 to 6).forall(i => r.getLong(i) >= 0L))
      assert(r.getLong(4) <= r.getLong(3), "token count cannot exceed char count")
      assert(r.getLong(5) <= r.getLong(4), "stopwords are a subset of tokens")
    }
  }

  test("each epoch is one map-side-combined aggregate (partial before the exchange)") {
    val w = Array.fill(5)(0L)
    val plan = feats.filter(col("y") * Perceptron.margin(w) <= 0)
      .agg(sum(col("y") * col("x0"))).queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial"), s"no partial aggregation:\n$plan")
  }
}
