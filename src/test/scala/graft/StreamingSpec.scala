package graft

import graft.streaming.EventStream
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming hourly rollup == batch hourly rollup (exactly-once)") {
    val streamed = EventStream.hourlyRollupAvailableNow(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q27_events_hourly")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("stream-stream interval join == batch interval join") {
    import org.apache.spark.sql.functions._
    val streamed = EventStream.clickPurchaseFunnelAvailableNow(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSet
    val ev = Tables.events(spark, TestSpark.sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    val batch = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 30 minutes"))
      .select(col("user_id"), unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"), col("purchase_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("routedIngest is exactly-once across restarts (checkpoint)") {
    val out = Files.createTempDirectory("graft_ingest").toString
    EventStream.routedIngest(spark, TestSpark.sf0001, out)
    val n1 = spark.read.parquet(out).count()
    // rerun with the same checkpoint: no new input -> no new rows
    EventStream.routedIngest(spark, TestSpark.sf0001, out)
    val n2 = spark.read.parquet(out).count()
    assert(n1 === Tables.events(spark, TestSpark.sf0001).count())
    assert(n2 === n1)
    // routing column materialized as partition dirs
    val types = spark.read.parquet(out).select("event_type").distinct().count()
    assert(types === 5)
  }
}
