package graft.streaming

import graft.operators.SpanStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Stream-triggered exact-substring-store maintenance — [[LmStream]]'s
  * pattern for the window-hash count store: each micro-batch of documents
  * is window-expanded once and written as its own generation through
  * [[SpanStore.spanStoreAppendOrReplay]] (gen = "b<batchId>", OVERWRITE),
  * so a crash-replayed batch (foreachBatch is at-least-once) rewrites the
  * same directories and converges, while a batch carrying doc ids some
  * OTHER generation already ingested fails fast. Probing
  * ([[SpanStore.duplicatedSpansIncremental]]) sees exactly-once window
  * counts under at-least-once delivery.
  */
object SpanStream {

  /** Drain the parquet document files under `srcDir` into the span store
    * at `storeDir` (which must exist — [[SpanStore.spanStoreBuild]]),
    * `maxFilesPerTrigger` files per micro-batch, AvailableNow. Re-running
    * with the same checkpoint is a no-op. Run
    * [[SpanStore.spanStoreCompact]] only between drains, passing
    * `keepGens` for any generation whose batch the checkpoint has not
    * committed.
    */
  def spanIngestAvailableNow(spark: SparkSession, srcDir: String,
      storeDir: String, idCol: String = "doc_id", textCol: String = "text",
      maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SpanStore.spanStoreAppendOrReplay(spark, batch, idCol, textCol,
          storeDir, gen = s"b$batchId")
      }
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
