package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TaxiCsvSpec extends SparkSuite {
  import spark.implicits._

  test("parses the reference's 17-field trip line with CRD/Cash mapping") {
    val line = "07290D3599E7A0D62097A346EFCC1FB5,E7750A37CAB07D0DFF0AF7E3573AC141," +
      "2013-01-01 00:00:00,2013-01-01 00:02:00,120,0.44,-73.956528,40.716976," +
      "-73.962440,40.715008,CSH,3.50,0.50,0.50,0.00,0.00,4.50"
    val df = TaxiCsv.parseLines(Seq(line).toDF("value"), "value")
    val r = df.head()
    assert(r.getAs[String]("medallion").startsWith("07290D"))
    assert(r.getAs[Int]("trip_time_in_secs") == 120)
    assert(r.getAs[String]("payment_type") == "Cash")
    assert(r.getAs[Float]("total_amount") == 4.5f)
    assert(r.getAs[java.sql.Timestamp]("event_time") ==
      r.getAs[java.sql.Timestamp]("dropoff_datetime"))
    val card = TaxiCsv.parseLines(Seq(line.replace(",CSH,", ",CRD,")).toDF("value"), "value")
    assert(card.head().getAs[String]("payment_type") == "Card")
  }
}
