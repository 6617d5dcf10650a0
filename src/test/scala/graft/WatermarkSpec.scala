package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time watermark semantics (SURVEY §2.9: the reference has no
  * late-data handling at all — this is the upgrade): a windowed streaming
  * aggregation with a watermark finalizes windows once the watermark
  * passes, and drops events arriving later than the allowed lateness.
  */
class WatermarkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("late events beyond the watermark are dropped from append output") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .select(date_format($"window.start", "HH:mm").as("w"), $"n", $"total")

    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("graft_watermark_test").start()

    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // batch 1: two events in [10:00, 10:10)
    mem.addData((ts(1), 1.0), (ts(5), 2.0))
    q.processAllAvailable()
    // batch 2: event at 10:31 pushes the watermark to 10:21 -> the
    // [10:00,10:10) window finalizes and is emitted
    mem.addData((ts(31), 3.0))
    q.processAllAvailable()
    // batch 3: a straggler for the finalized window — must be DROPPED
    mem.addData((ts(2), 100.0))
    q.processAllAvailable()
    // batch 4: advance far enough to flush remaining windows
    mem.addData((ts(59), 4.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("graft_watermark_test")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("10:00") === ((2L, 3.0)), "finalized window excludes the late straggler")
    assert(out("10:30") === ((1L, 3.0)))
  }
}
