package graft.streaming

import graft.operators.History
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Stream-triggered SCD2 warehouse maintenance: the reference's
  * Kafka→warehouse relay (kafka_hdfs_consumer.py — consume a file, load it
  * into the serving store) upgraded to CDC semantics. Each micro-batch of
  * change events merges into the persisted SCD2 store through
  * [[History.scd2ApplyOrReplay]]: new batches append to the bucketed event
  * log and rebuild only the affected bucket directories; a crash-replayed
  * batch (foreachBatch is at-least-once) is recognized by its already-
  * stored (key, tie) identities and re-runs just the idempotent history
  * rebuild — the store converges to exactly-once content under
  * at-least-once delivery.
  */
object CdcStream {

  /** Drain the parquet event files under `srcDir` into the SCD2 store at
    * `storeDir` (which must exist — [[History.scd2Build]]),
    * `maxFilesPerTrigger` files per micro-batch, AvailableNow. Re-running
    * with the same checkpoint is a no-op.
    */
  def scd2IngestAvailableNow(spark: SparkSession, srcDir: String,
      storeDir: String, keyCol: String, attrCol: String, tsCol: String,
      tieCol: String, maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        History.scd2ApplyOrReplay(spark, storeDir, batch,
          keyCol, attrCol, tsCol, tieCol)
      }
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
