package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's Kafka message protocol (SURVEY.md §2.9): each CSV file
  * is replayed as a JSON envelope stream — one `metadata` message, N
  * per-line `data` messages, one `end` message, keyed by filename
  * (`/root/reference/src/kafka/file_watcher_producer.py:71-119`).
  *
  * This module is the Spark-native landing layer for that protocol: parse
  * the envelope with `from_json`, filter to payload lines, and route by
  * filename substring (`kafka_hdfs_consumer.py:315-351`: `location` →
  * locations, else weather). It works identically over a Kafka source
  * (`readStream.format("kafka")` value column) or any string column in
  * tests — the broker is not required to exercise the protocol semantics.
  */
object KafkaEnvelope {

  /** `{type: metadata|data|end, filename, line_number, content, timestamp}` */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("filename", StringType),
    StructField("line_number", LongType),
    StructField("content", StringType),
    StructField("timestamp", StringType)))

  /** Parse raw JSON envelope strings into typed columns. */
  def parse(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.withColumn("env", from_json(col(valueCol), envelopeSchema))
      .select(col("env.*"))

  /** Payload lines only, in file order (drop metadata/end framing — the
    * framing exists because the reference's consumer needed to know when a
    * file was complete; Structured Streaming's per-batch transactionality
    * subsumes it).
    */
  def dataLines(parsed: DataFrame): DataFrame =
    parsed.filter(col("type") === "data")
      .select(col("filename"), col("line_number"), col("content"))

  /** Routing predicate from the consumer: filename containing "location"
    * goes to the location table, everything else to weather.
    */
  def route(filename: Column): Column =
    when(lower(filename).contains("location"), "locations").otherwise("weather")

  /** Completed files: filenames whose `end` marker arrived — the batch
    * trigger condition (`kafka_hdfs_consumer.py:334-351`).
    */
  def completedFiles(parsed: DataFrame): DataFrame =
    parsed.filter(col("type") === "end").select(col("filename")).distinct()
}
