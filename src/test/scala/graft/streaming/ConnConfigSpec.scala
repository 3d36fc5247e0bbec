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
  }
}
