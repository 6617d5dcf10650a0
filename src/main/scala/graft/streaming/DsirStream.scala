package graft.streaming

import graft.operators.DsirStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Stream-triggered DSIR-fit maintenance — [[LmStream]]'s pattern for the
  * persisted importance-resampling fit: each micro-batch of crawl
  * documents is bucket-counted once and written as its own generation
  * through [[DsirStore.dsirAppendOrReplay]] (gen = "b<batchId>",
  * OVERWRITE), so a crash-replayed batch (foreachBatch is at-least-once)
  * rewrites the same file and converges; scoring
  * ([[DsirStore.dsirScore]]) sees exactly-once counts under
  * at-least-once delivery. The streamed side defaults to the RAW pool —
  * the side a live crawl keeps refreshing while the curated target
  * sample stays fixed — but target-side streams are the same call.
  */
object DsirStream {

  /** Drain the parquet document files under `srcDir` into the DSIR fit at
    * `storeDir` (which must exist — [[DsirStore.dsirBuild]]),
    * `maxFilesPerTrigger` files per micro-batch, AvailableNow. Re-running
    * with the same checkpoint is a no-op. Run [[DsirStore.dsirCompact]]
    * only between drains, passing `keepGens` for any generation whose
    * batch the checkpoint has not committed. */
  def dsirIngestAvailableNow(spark: SparkSession, srcDir: String,
      storeDir: String, textCol: String = "text",
      side: String = DsirStore.SideRaw, maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        DsirStore.dsirAppendOrReplay(spark, batch, textCol, storeDir, side,
          gen = s"b$batchId")
      }
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
