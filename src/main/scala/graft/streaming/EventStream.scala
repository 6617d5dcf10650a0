package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming re-realization of the reference's file-replay
  * pipeline (SURVEY.md §2.9): the watchdog→Kafka→HDFS relay becomes a file
  * source with checkpointed exactly-once semantics (strictly stronger than
  * the reference's at-least-once consumer), and the ClickHouse
  * SummingMergeTree materialized view (`init.sql:73-85`) becomes a windowed
  * streaming aggregation.
  *
  * For local verification we drive the stream with `Trigger.AvailableNow`
  * over the same parquet the batch queries read, land it in a memory sink,
  * and compare against the batch oracle — stream results must equal batch
  * results on the same input (the exactly-once invariant the reference
  * never had).
  */
object EventStream {

  @volatile private var sinkCounter = 0

  /** The events table as an unbounded stream with the same nanos→micros
    * ts normalization as `Tables.events`.
    */
  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
  }

  /** Drain a streaming frame to a fresh memory sink with AvailableNow and
    * return the result table. Stateful-op state partition count is pinned
    * from shuffle.partitions at FIRST batch; 8 partitions keeps the
    * HDFSBackedStateStore commit+fsync cycles proportionate to a few
    * thousand state rows (the session conf is restored afterwards).
    */
  private def drain(spark: SparkSession, df: DataFrame, prefix: String,
      mode: String, statePartitions: Int = 8): DataFrame = {
    val name = synchronized { sinkCounter += 1; s"${prefix}_$sinkCounter" }
    val conf = spark.sessionState.conf
    val saved = conf.getConfString("spark.sql.shuffle.partitions")
    val query =
      try {
        conf.setConfString("spark.sql.shuffle.partitions", statePartitions.toString)
        df.writeStream
          .outputMode(mode)
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
      } finally conf.setConfString("spark.sql.shuffle.partitions", saved)
    query.awaitTermination()
    spark.table(name)
  }

  /** Stream-stream interval join (funnel attribution): every click joins
    * the same user's purchases landing within the following 30 minutes.
    * BOTH sides carry watermarks and the join condition bounds event time
    * on both, so each side's join state is evicted once older than
    * watermark + interval — the only stream-stream join formulation whose
    * state is bounded on unbounded inputs. Inner join results emit as
    * soon as both rows arrive (append mode); timestamps are emitted as
    * epoch micros so the batch oracle replays the exact truncated-μs
    * comparison.
    */
  def clickPurchaseFunnelAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    // one source, two filtered views — a stream self-join scans the input
    // once per micro-batch instead of running two file sources
    val events = eventStream(spark, dir)
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 30 minutes"))
      .select(col("user_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        col("purchase_value"))
    drain(spark, joined, "graft_stream_funnel", "append")
  }

  /** Hourly per-event-type rollup as a stream, drained to completion.
    * Returns the result as a DataFrame identical in shape to the batch
    * `q27_events_hourly` query.
    */
  def hourlyRollupAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.functions.ColumnFunctions.pround(sum(col("value")), 2).as("total_value"),
        graft.functions.ColumnFunctions.pround(avg(col("value")), 2).as("avg_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"), col("n_events"), col("total_value"), col("avg_value"))
    drain(spark, agg, "graft_stream_hourly", "complete")
  }

  /** Streaming exact dedup + rollup: dropDuplicatesWithinWatermark keys
    * state on event_id but EVICTS entries older than the watermark — the
    * only dedup formulation whose state is bounded on an unbounded stream
    * (a plain dropDuplicates would grow state forever). Drained with
    * AvailableNow; result must equal the batch count-distinct oracle.
    */
  def dedupCountAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique_events"))
    drain(spark, agg, "graft_stream_dedup", "complete")
  }

  /** Stream-static join + rollup: the unbounded stream joins a small batch
    * dimension (re-read per micro-batch, so dim updates are picked up —
    * Spark's stream-static contract), then aggregates per tier. The dim
    * broadcasts; the stream never shuffles before the aggregation.
    */
  def tieredRollupAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tiers = Seq(
      ("purchase", "conversion"), ("signup", "conversion"),
      ("click", "engagement"), ("view", "engagement"),
      ("error", "ops")).toDF("event_type", "tier")

    val agg = eventStream(spark, dir)
      .join(broadcast(tiers), Seq("event_type"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.ColumnFunctions.pround(sum(col("value")), 2).as("total_value"))
    drain(spark, agg, "graft_stream_tiered", "complete")
  }

  /** File-ingest with routing (kafka_hdfs_consumer.py:37-110 shape): one
    * stream, `foreachBatch` writes each micro-batch to parquet partitioned
    * by a routing column, exactly once per batch id. Used by StreamingSpec.
    */
  def routedIngest(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val schema = spark.read.parquet(s"$srcDir/events.parquet").schema
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("append").partitionBy("event_type").parquet(outDir)
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
