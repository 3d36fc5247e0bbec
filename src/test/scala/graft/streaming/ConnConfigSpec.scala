package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class ConnConfigSpec extends AnyFunSuite {

  test("env-driven connection config with reference-style defaults") {
    val env = Map(
      "GRAFT_INGRESS_TYPE" -> "kafka",
      "GRAFT_INGRESS_HOST" -> "broker1",
      "GRAFT_INGRESS_PORT" -> "9092",
      "GRAFT_INGRESS_TOPIC" -> "trips")
    assert(ConnConfig.ingress(env) == ConnConfig.Conn("kafka", "broker1", 9092, "trips"))
    assert(ConnConfig.egress(Map.empty) == ConnConfig.Conn("socket", "localhost", 9001, "graft"))
  }

  test("mqtt reports an explicit unsupported error") {
    val spark = graft.SparkSuite.session
    val ex = intercept[UnsupportedOperationException] {
      ConnConfig.openSource(spark, ConnConfig.Conn("mqtt", "h", 1883, "t"))
    }
    assert(ex.getMessage.contains("MQTT"))
    val ex2 = intercept[UnsupportedOperationException] {
      ConnConfig.openSink(spark.range(1).toDF(), ConnConfig.Conn("mqtt", "h", 1883, "t"), "/tmp/cp")
    }
    assert(ex2.getMessage.contains("MQTT"))
  }

  test("kafka producer sink configures a writer without needing a broker") {
    // broker-less environment: the writer must build (options validated at
    // start(), which a real deployment calls with a reachable broker)
    val spark = graft.SparkSuite.session
    import spark.implicits._
    val df = spark.readStream.format("rate").load().select($"value")
    val w = ConnConfig.openSink(df, ConnConfig.Conn("kafka", "broker1", 9092, "t"), "/tmp/cp-kafka")
    assert(w != null)
    val batch = Seq("a", "b").toDF("value")
    // batch writer helper: same shape; .save() needs a broker, so only
    // exercise construction + serialization projection here
    assert(batch.selectExpr("CAST(value AS STRING) AS value").columns.sameElements(Array("value")))
  }
}
