package graft.streaming

import graft.operators.ClusterStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Stream-triggered duplicate-cluster maintenance: the reference's
  * Kafka→warehouse relay (kafka_hdfs_consumer.py — consume a file, load it
  * into the serving store) applied to the persisted cluster store. Each
  * micro-batch of documents is absorbed through
  * [[ClusterStore.ccApplyOrReplay]]: new batches derive their candidate
  * edges from the stored hub table and rewrite only the label buckets
  * that changed; a crash-replayed batch (foreachBatch is at-least-once)
  * is recognized by its already-labelled ids — or, for a crash between
  * the hub append and the label rewrite, converges through the normal
  * apply path — so the store holds exactly-once content under
  * at-least-once delivery.
  */
object CcStream {

  /** Drain the parquet document files under `srcDir` into the cluster
    * store at `storeDir` (which must exist — [[ClusterStore.ccBuild]]),
    * `maxFilesPerTrigger` files per micro-batch, AvailableNow. Re-running
    * with the same checkpoint is a no-op. Run [[ClusterStore.ccCompact]]
    * only between drains (single-writer contract).
    */
  def ccIngestAvailableNow(spark: SparkSession, srcDir: String,
      storeDir: String, idCol: String = "doc_id", textCol: String = "text",
      windows: Seq[(Int, Int)] = Seq((1, 8), (5, 12)),
      maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ClusterStore.ccApplyOrReplay(spark, storeDir, batch,
          idCol, textCol, windows)
      }
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
