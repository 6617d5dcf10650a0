package graft.streaming

import graft.operators.VectorStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Stream-triggered ANN-store maintenance — [[IndexStream]]'s pattern for
  * the vector store: each micro-batch of embeddings is assigned against
  * the store's frozen quantizer and written as its own generation through
  * [[VectorStore.annAppendOrReplay]] (gen = "b<batchId>", OVERWRITE), so a
  * crash-replayed batch (foreachBatch is at-least-once) rewrites the same
  * directory and converges, while a batch carrying ids some OTHER
  * generation already ingested fails fast. The store serves
  * ([[VectorStore.annSearch]]) exactly-once content under at-least-once
  * delivery.
  */
object VectorStream {

  /** Drain the parquet embedding files under `srcDir` into the ANN store
    * at `storeDir` (which must exist — [[VectorStore.annBuild]] freezes
    * the quantizer), `maxFilesPerTrigger` files per micro-batch,
    * AvailableNow. Re-running with the same checkpoint is a no-op. Run
    * [[VectorStore.annCompact]] only between drains, passing `keepGens`
    * for any generation whose batch the checkpoint has not committed.
    */
  def annIngestAvailableNow(spark: SparkSession, srcDir: String,
      storeDir: String, idCol: String = "vec_id",
      vecCol: String = "embedding", maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        VectorStore.annAppendOrReplay(spark, batch, idCol, vecCol, storeDir,
          gen = s"b$batchId")
      }
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
