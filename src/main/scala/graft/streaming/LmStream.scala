package graft.streaming

import graft.operators.LmStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Stream-triggered LM-register maintenance — [[IndexStream]]'s pattern
  * for the bigram count store: each micro-batch of documents is counted
  * once and written as its own generation through
  * [[LmStore.lmAppendOrReplay]] (gen = "b<batchId>", OVERWRITE), so a
  * crash-replayed batch (foreachBatch is at-least-once) rewrites the same
  * directories and converges, while a batch carrying doc ids some OTHER
  * generation already ingested fails fast. Scoring ([[LmStore.lmScore]])
  * sees exactly-once counts under at-least-once delivery.
  */
object LmStream {

  /** Drain the parquet document files under `srcDir` into the LM store at
    * `storeDir` (which must exist — [[LmStore.lmBuild]]), `maxFilesPerTrigger`
    * files per micro-batch, AvailableNow. Re-running with the same
    * checkpoint is a no-op. Run [[LmStore.lmCompact]] only between drains,
    * passing `keepGens` for any generation whose batch the checkpoint has
    * not committed.
    */
  def lmIngestAvailableNow(spark: SparkSession, srcDir: String,
      storeDir: String, idCol: String = "doc_id", textCol: String = "text",
      maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        LmStore.lmAppendOrReplay(spark, batch, idCol, textCol, storeDir,
          gen = s"b$batchId")
      }
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
