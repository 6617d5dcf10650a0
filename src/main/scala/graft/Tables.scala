package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test corpus (TESTDATA.md): a TPC-H-ish
  * star schema plus `events` (stream-shaped), `documents` and `embeddings`
  * (LLM-pipeline shaped). Parquet carries the schema; we never infer from
  * CSV in production paths (SURVEY.md §4.1 — explicit schemas only).
  *
  * At 100 TB these reads become partitioned-directory scans; the single-file
  * layout here is the driver's fixture shape. All downstream operators only
  * assume column names/types, never file layout.
  */
object Tables {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val allTables: Seq[String] = starTables ++ Seq("events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  /** `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it as Long under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/test
    * sessions — Spark has no native nanos type). Normalize to a micros
    * TimestampType column with integer division (no double round-trip: ns
    * epoch values exceed double's 53-bit mantissa).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _        => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every table as a temp view so `spark.sql` surfaces work too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    allTables.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
