package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming corpus dedup: the reference's stream-triggered batch
  * orchestration (kafka_hdfs_consumer.py:334-351 — consume a file, kick a
  * batch job over it) upgraded to the corpus layer. Every micro-batch of
  * documents is cleaned against the PERSISTED dedup state with
  * [[graft.operators.Dedup.dedupIncremental]] — the old corpus is never
  * re-paired with itself, only semi-join-pruned point lookups touch it —
  * then the survivors land in the corpus store and their band signatures
  * APPEND to the band state. State grows append-only across batches; the
  * morning's crawl costs the morning's crawl, not the corpus.
  *
  * Exactly-once materialization: each micro-batch writes its survivors
  * (and signatures) under a `batch=<id>` directory with overwrite, so a
  * replayed micro-batch (foreachBatch is at-least-once under failure)
  * rewrites identical content instead of duplicating it — the file
  * source's batch composition is deterministic under the stream
  * checkpoint, and the dedup itself is deterministic by construction.
  */
object DedupStream {

  /** Drain the parquet documents under `srcDir` through incremental dedup
    * into `stateDir` (`corpus/` survivors + `bands/` signature state),
    * `maxFilesPerTrigger` files per micro-batch, AvailableNow. Re-running
    * with the same checkpoint is a no-op (nothing new to ingest). The
    * checkpoint and the state share `stateDir` as one lifecycle unit —
    * batch ids namespace the state generations.
    */
  def dedupIngestAvailableNow(spark: SparkSession, srcDir: String,
      stateDir: String, idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, threshold: Double = 0.7, k: Int = 32,
      bands: Int = 16, maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, batch, batchId, stateDir, idCol, textCol,
          shingleN, threshold, k, bands)
      }
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One micro-batch of the ingest, REPLAY-SAFE: the state read excludes
    * generation `batchId` and later, so a batch whose writes landed before
    * a crash re-cleans against exactly the state it saw the first time —
    * without the exclusion a replayed batch would meet its OWN signatures
    * in the store and drop every document as a self-duplicate. Exposed
    * package-private so the spec can exercise the replay path directly.
    */
  private[graft] def ingestBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, stateDir: String, idCol: String, textCol: String,
      shingleN: Int, threshold: Double, k: Int, bands: Int): Unit = {
    val corpusDir = s"$stateDir/corpus"
    val bandsDir = s"$stateDir/bands"
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior =
      if (!fs.exists(new org.apache.hadoop.fs.Path(bandsDir))) None
      else {
        val ob = spark.read.parquet(bandsDir).filter(col("batch") < batchId)
        if (ob.isEmpty) None
        else Some((spark.read.parquet(corpusDir).filter(col("batch") < batchId), ob))
      }
    val survivors =
      (prior match {
        case None =>
          Dedup.dedupCorpus(batch, idCol, textCol, shingleN, threshold, k, bands)
        case Some((oldDocs, oldBands)) =>
          Dedup.dedupIncremental(batch, oldDocs, oldBands,
            idCol, textCol, shingleN, threshold, k, bands)
      })
        // materialized once: the corpus write and the signature write
        // below must not each re-run the MinHash + candidate join
        .localCheckpoint()
    survivors.write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
    Dedup.bandSignatures(survivors, idCol, textCol, shingleN, k, bands)
      .write.mode("overwrite").parquet(s"$bandsDir/batch=$batchId")
    survivors.unpersist()
    ()
  }

  /** The deduped corpus accumulated so far (batch provenance dropped). */
  def corpus(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/corpus").drop("batch")

  /** Fold the corpus/band generations STRICTLY BELOW `uptoBatch` into a
    * single `batch=<uptoBatch-1>` directory per surface — after N
    * micro-batches the state otherwise holds N directories whose listing
    * and open cost grows linearly with ingest history. Content is
    * unchanged (generation rows are disjoint), and the replay contract is
    * preserved by construction: a replayed batch b >= uptoBatch still
    * excludes its own generation (`batch < b` includes the compacted
    * directory, whose id is < uptoBatch <= b) and still owns its
    * `batch=b` overwrite target untouched. `uptoBatch` must therefore be
    * at most the stream's committed watermark — a batch id at or below it
    * can no longer be redelivered under the checkpoint.
    *
    * Crash safety (the staged-swap pattern of `Indexing.indexCompact`,
    * with a commit marker because the live directory keeps its later
    * generations): the folded generation is fully written to a staging
    * directory and committed with a `_COMPLETE` marker BEFORE any live
    * directory is deleted; a crash mid-write discards the unmarked
    * staging, a crash mid-promote finds the marked staging and finishes
    * the swap. Single writer: never run concurrently with an active
    * ingest of the folded generations.
    */
  def compactState(spark: SparkSession, stateDir: String, uptoBatch: Long): Unit = {
    require(uptoBatch >= 1, "need uptoBatch >= 1")
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (surface <- Seq("corpus", "bands"))
      compactSurface(spark, fs, s"$stateDir/$surface", uptoBatch)
  }

  private def batchIds(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
  }

  private def compactSurface(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String, upto: Long): Unit = {
    import org.apache.spark.sql.functions.col
    val tmp = new org.apache.hadoop.fs.Path(s"${dir}__compact_tmp")
    val marker = new org.apache.hadoop.fs.Path(tmp, "_COMPLETE")
    // an unmarked staging dir is a crashed mid-write — discard and redo
    if (fs.exists(tmp) && !fs.exists(marker)) fs.delete(tmp, true)
    if (!fs.exists(tmp)) {
      if (batchIds(fs, dir).count(_ < upto) <= 1) return // nothing to fold
      spark.read.parquet(dir).filter(col("batch") < upto).drop("batch")
        .write.parquet(new org.apache.hadoop.fs.Path(tmp,
          s"batch=${upto - 1}").toString)
      fs.create(marker).close() // commit point: staging is complete
    }
    // promote (first run or recovery): the staged generation's own name
    // says which live generations it replaces — the current `upto` is
    // deliberately ignored here so recovering an older run stays correct
    fs.listStatus(tmp).map(_.getPath).find(_.getName.startsWith("batch="))
      .foreach { staged =>
        val target = staged.getName.stripPrefix("batch=").toLong
        batchIds(fs, dir).filter(_ <= target).foreach(b =>
          fs.delete(new org.apache.hadoop.fs.Path(dir, s"batch=$b"), true))
        require(fs.rename(staged,
          new org.apache.hadoop.fs.Path(dir, staged.getName)),
          s"compactState: rename of $staged failed")
      }
    fs.delete(tmp, true)
    ()
  }
}
