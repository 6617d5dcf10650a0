package graft

import graft.streaming.IncrementalMV
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained sum/count MV must equal the batch recompute, stay
  * idempotent across re-drains (checkpoint), and absorb out-of-band
  * merges incrementally.
  */
class IncrementalMVSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed MV == batch recompute; re-drain is a no-op") {
    val store = Files.createTempDirectory("graft_mv").toString + "/mv"
    IncrementalMV.maintain(spark, TestSpark.sf0001, store)

    val mv = IncrementalMV.readView(spark, store)
      .select($"event_type", $"hour", round($"sum_value", 2).as("s"), $"cnt")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap

    val batch = Tables.events(spark, TestSpark.sf0001)
      .groupBy($"event_type",
        date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00:00").as("hour"))
      .agg(round(sum($"value"), 2).as("s"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap

    assert(mv === batch)

    // second drain with the same checkpoint: no new input, store unchanged
    IncrementalMV.maintain(spark, TestSpark.sf0001, store)
    val again = IncrementalMV.readView(spark, store).count()
    assert(again === mv.size)
  }

  test("mergeBatch accumulates deltas keyed exactly once") {
    val store = Files.createTempDirectory("graft_mv2").toString + "/mv"
    val d1 = Seq(("a", "h1", 10.0, 2L), ("b", "h1", 5.0, 1L))
      .toDF("event_type", "hour", "sum_value", "cnt")
    val d2 = Seq(("a", "h1", 7.0, 3L), ("c", "h2", 1.0, 1L))
      .toDF("event_type", "hour", "sum_value", "cnt")
    IncrementalMV.mergeBatch(spark, store, d1, Seq("event_type", "hour"))
    IncrementalMV.mergeBatch(spark, store, d2, Seq("event_type", "hour"))
    val got = IncrementalMV.readView(spark, store)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("sum_value"), r.getAs[Long]("cnt"), r.getAs[Double]("avg_value"))).toMap
    assert(got(("a", "h1")) === ((17.0, 5L, 3.4)))
    assert(got(("b", "h1")) === ((5.0, 1L, 5.0)))
    assert(got(("c", "h2")) === ((1.0, 1L, 1.0)))
  }

  test("mergeBatch recovers state stranded between delete and rename") {
    val store = Files.createTempDirectory("graft_mv3").toString + "/mv"
    val d1 = Seq(("a", "h1", 10.0, 2L)).toDF("event_type", "hour", "sum_value", "cnt")
    IncrementalMV.mergeBatch(spark, store, d1, Seq("event_type", "hour"))
    // simulate the crash window: the swap deleted the store but never
    // renamed the staged merge in — tmp holds the ONLY copy of the state
    assert(new java.io.File(store).renameTo(new java.io.File(store + "_tmp")))
    val d2 = Seq(("a", "h1", 7.0, 3L)).toDF("event_type", "hour", "sum_value", "cnt")
    IncrementalMV.mergeBatch(spark, store, d2, Seq("event_type", "hour"))
    val got = IncrementalMV.readView(spark, store)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("sum_value"), r.getAs[Long]("cnt"))).toMap
    assert(got(("a", "h1")) === ((17.0, 5L)),
      "the stranded state must be promoted, not silently reset")
  }
}
