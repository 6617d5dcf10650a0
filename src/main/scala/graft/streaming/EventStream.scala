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

  /** Hourly per-event-type rollup as a stream, drained to completion.
    * Returns the result as a DataFrame identical in shape to the batch
    * `q27_events_hourly` query.
    */
  def hourlyRollupAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file-source streams need a directory; glob-filter down to the table
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    // same nanos→micros normalization as Tables.events
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }

    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.functions.ColumnFunctions.pround(sum(col("value")), 2).as("total_value"),
        graft.functions.ColumnFunctions.pround(avg(col("value")), 2).as("avg_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"), col("n_events"), col("total_value"), col("avg_value"))

    val name = synchronized { sinkCounter += 1; s"graft_stream_hourly_$sinkCounter" }
    // Stateful-agg state partition count is pinned from shuffle.partitions
    // at first batch; 32 partitions means 32 HDFSBackedStateStore
    // commit+fsync cycles per micro-batch for a few thousand state rows.
    // Drop to 8 for the stream, restore the session conf afterwards.
    val conf = spark.sessionState.conf
    val saved = conf.getConfString("spark.sql.shuffle.partitions")
    val query =
      try {
        conf.setConfString("spark.sql.shuffle.partitions", "8")
        agg.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
      } finally conf.setConfString("spark.sql.shuffle.partitions", saved)
    query.awaitTermination()
    spark.table(name)
  }

  /** Streaming exact dedup + rollup: dropDuplicatesWithinWatermark keys
    * state on event_id but EVICTS entries older than the watermark — the
    * only dedup formulation whose state is bounded on an unbounded stream
    * (a plain dropDuplicates would grow state forever). Drained with
    * AvailableNow; result must equal the batch count-distinct oracle.
    */
  def dedupCountAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
    val agg = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique_events"))

    val name = synchronized { sinkCounter += 1; s"graft_stream_dedup_$sinkCounter" }
    val conf = spark.sessionState.conf
    val saved = conf.getConfString("spark.sql.shuffle.partitions")
    val query =
      try {
        conf.setConfString("spark.sql.shuffle.partitions", "8")
        agg.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
      } finally conf.setConfString("spark.sql.shuffle.partitions", saved)
    query.awaitTermination()
    spark.table(name)
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

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
    val agg = stream
      .join(broadcast(tiers), Seq("event_type"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.ColumnFunctions.pround(sum(col("value")), 2).as("total_value"))

    val name = synchronized { sinkCounter += 1; s"graft_stream_tiered_$sinkCounter" }
    val conf = spark.sessionState.conf
    val saved = conf.getConfString("spark.sql.shuffle.partitions")
    val query =
      try {
        conf.setConfString("spark.sql.shuffle.partitions", "8")
        agg.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
      } finally conf.setConfString("spark.sql.shuffle.partitions", saved)
    query.awaitTermination()
    spark.table(name)
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
