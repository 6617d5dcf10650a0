package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines ingest — the de-facto interchange format of training-data
  * pipelines (one JSON document per line, append-friendly, splittable).
  * Spark-first shape: `spark.read.schema(...).json` with an EXPLICIT
  * schema always (SURVEY §4.1 — schema inference reads the corpus twice
  * and hides drift) and the same whole-row malformed policy as
  * [[CsvIngest]]: PERMISSIVE + corrupt-record column, because
  * DROPMALFORMED is projection-dependent (a bare count() parses zero
  * fields and drops nothing).
  *
  * Scale: a JSONL file is line-splittable, so
  * `spark.sql.files.maxPartitionBytes` shards one huge file across the
  * cluster; parsing is per-row, shuffle-free.
  */
object JsonIngest {

  /** Read JSONL at `path` with whole-row malformed semantics (bad line →
    * row dropped, never nulls smeared into typed columns). Returns the
    * frame plus a release handle for the one materialization the corrupt
    * filter needs (same contract as [[CsvIngest.readCsvManaged]]).
    */
  def readJsonlManaged(spark: SparkSession, path: String, schema: StructType,
      dropMalformed: Boolean = true,
      corruptFilterStorage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): (DataFrame, () => Unit) = {
    val df0 = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema.add("_corrupt", StringType))
      .json(path)
    if (dropMalformed) {
      // Spark disallows filtering a raw JSON scan by only its corrupt
      // column — materialize once, filter, hand back the release handle
      val cached = df0.persist(corruptFilterStorage)
      (cached.filter(col("_corrupt").isNull).drop("_corrupt"),
        () => { cached.unpersist(); () })
    } else (df0.drop("_corrupt"), () => ())
  }

  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      dropMalformed: Boolean = true): DataFrame =
    readJsonlManaged(spark, path, schema, dropMalformed)._1

  /** Write a frame as JSONL — the hand-off format for downstream tokenizer
    * / training jobs. One file per partition; line-splittable on re-read.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
