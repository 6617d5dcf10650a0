package graft

import graft.streaming.KafkaEnvelope
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KafkaEnvelopeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val raw = Seq(
    """{"type":"metadata","filename":"weatherData.csv","line_number":0,"content":"header","timestamp":"t0"}""",
    """{"type":"data","filename":"weatherData.csv","line_number":1,"content":"1,1/5/2010,30.0","timestamp":"t1"}""",
    """{"type":"data","filename":"weatherData.csv","line_number":2,"content":"1,1/6/2010,31.0","timestamp":"t2"}""",
    """{"type":"end","filename":"weatherData.csv","line_number":3,"content":"","timestamp":"t3"}""",
    """{"type":"data","filename":"locationData_3.csv","line_number":1,"content":"1,Colombo","timestamp":"t4"}""",
    """not json at all""",
  ).toDF("value")

  test("parse + dataLines keeps only payload rows, malformed JSON -> nulls out") {
    val parsed = KafkaEnvelope.parse(raw)
    val data = KafkaEnvelope.dataLines(parsed).collect()
    assert(data.length === 3)
    assert(data.map(_.getAs[Long]("line_number")).sorted.toSeq === Seq(1L, 1L, 2L))
  }

  test("route: location files split from weather files") {
    val routed = KafkaEnvelope.dataLines(KafkaEnvelope.parse(raw))
      .withColumn("table", KafkaEnvelope.route($"filename"))
      .groupBy($"table").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(routed === Map("weather" -> 2, "locations" -> 1))
  }

  test("completedFiles: only files whose end marker arrived") {
    val done = KafkaEnvelope.completedFiles(KafkaEnvelope.parse(raw))
      .collect().map(_.getString(0))
    assert(done.toSeq === Seq("weatherData.csv"))
  }
}
