package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted duplicate-cluster store: the productionized caller promised
  * by [[Components.connectedComponentsIncremental]] — a labelling (doc →
  * cluster) plus the fingerprint HUB table that lets a new batch derive
  * its candidate edges by point lookup against persisted state, never by
  * rescanning (or re-tokenizing) the old corpus.
  *
  * Layout under `path`:
  *  - `hubs/`   (w, fp, dst): one representative doc id per (window,
  *    fingerprint) ever seen. A hub need not be the group's min id —
  *    any member preserves connectivity, so appends never rewrite it.
  *  - `labels/` (id, cluster_id) `partitionBy(__bucket)` on a hash of the
  *    id — the unit of incremental rewrite, the [[History]] bucket shape.
  *  - `meta/`   (n_buckets, windows) — the fingerprint scheme is stamped
  *    so an apply with mismatched windows fails fast instead of silently
  *    fragmenting clusters.
  *
  * Scale shape of [[ccApply]]: the batch's fingerprints meet the hub
  * table through one fp-keyed equi-join (the hub table is fingerprint
  * metadata — O(corpus) rows but a fraction of corpus bytes; a sorted or
  * bucketed table format turns this into a true point lookup in
  * production), old connectivity enters as depth-1 label edges
  * (16-byte rows), and the label rewrite touches only the buckets whose
  * labels changed — dynamic partition overwrite, untouched buckets stay
  * byte-identical. Nothing ever re-pairs the old corpus with itself.
  */
object ClusterStore {

  private def bucketOf(id: Column, n: Int) =
    pmod(xxhash64(id.cast("string")), lit(n.toLong)).cast("int")

  private def windowsTag(windows: Seq[(Int, Int)]): String =
    windows.map { case (a, b) => s"$a-$b" }.mkString(",")

  /** Initialize the store from a corpus: fingerprint, pick hubs, run
    * batch connected components, persist labels + hubs + scheme. */
  def ccBuild(docs: DataFrame, idCol: String, textCol: String, path: String,
      windows: Seq[(Int, Int)] = Seq((1, 8), (5, 12)), nBuckets: Int = 16): Unit = {
    require(nBuckets >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(path), true)
    // one fingerprint evaluation feeds the hub write, the edge join and
    // (via hubs) the CC seed
    val fps = Components.fingerprintRows(docs, idCol, textCol, windows)
      .localCheckpoint()
    val hubs = fps.groupBy(col("w"), col("fp")).agg(min(col("id")).as("dst"))
      .localCheckpoint()
    hubs.write.mode("overwrite").parquet(s"$path/hubs")
    val edges = fps.join(hubs, Seq("w", "fp"))
      .select(col("id").as("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    Components.connectedComponents(
      docs.select(col(idCol).cast("long").as("id")), edges)
      .withColumn("__bucket", bucketOf(col("id"), nBuckets))
      .write.mode("overwrite").partitionBy("__bucket").parquet(s"$path/labels")
    fps.unpersist()
    hubs.unpersist()
    Seq((nBuckets, windowsTag(windows))).toDF("n_buckets", "windows")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Absorb a NEW document batch: derive its candidate edges from the
    * persisted hub table (known fingerprints link to their stored hub;
    * novel fingerprints elect a hub within the batch), run
    * [[Components.connectedComponentsIncremental]] against the stored
    * labelling, rewrite only the buckets whose labels changed, and append
    * the novel hubs. Law (ClusterStoreSpec): build(b1) + apply(b2) equals
    * a batch build over b1 ∪ b2.
    *
    * Redelivery is fail-fast (a batch doc id already labelled aborts the
    * apply): hub appends land BEFORE the label rewrite, so a crash
    * between them re-applies cleanly — the batch's own hubs resolve as
    * "known" and its novel-hub append is empty — but a crash mid-label-
    * write needs the batch deduplicated upstream before re-driving, the
    * [[History.scd2Apply]] contract.
    */
  def ccApply(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String,
      windows: Seq[(Int, Int)] = Seq((1, 8), (5, 12))): Unit = {
    val meta = spark.read.parquet(s"$path/meta")
      .select(col("n_buckets"), col("windows")).head()
    val nBuckets = meta.getInt(0)
    require(meta.getString(1) == windowsTag(windows),
      s"ccApply: fingerprint windows ${windowsTag(windows)} do not match " +
        s"the store's scheme ${meta.getString(1)} — a mismatched apply " +
        "would silently fragment clusters")
    // pinned once: the guard, the fingerprint joins and the CC vertex set
    // must all see the SAME batch evaluation
    val b = batch.select(col(idCol).cast("long").as("id"),
      col(textCol).as("__text")).localCheckpoint()
    try {
      val batchIds = b.select(col("id"))
      val dupe = spark.read.parquet(s"$path/labels").select(col("id"))
        .join(batchIds, Seq("id"), "left_semi")
      require(dupe.isEmpty,
        "ccApply: batch contains doc ids already labelled — deduplicate " +
          "redelivered batches before apply")
      val fps = Components.fingerprintRows(b, "id", "__text", windows)
        .localCheckpoint()
      try {
        applyBody(spark, path, fps, batchIds, nBuckets)
      } finally fps.unpersist()
    } finally b.unpersist()
    ()
  }

  /** The edge derivation + label rewrite of [[ccApply]] (split out so the
    * checkpoint releases wrap it on every path). */
  private def applyBody(spark: SparkSession, path: String, fps: DataFrame,
      batchIds: DataFrame, nBuckets: Int): Unit = {
    val stored = spark.read.parquet(s"$path/hubs")
    val known = fps.join(stored, Seq("w", "fp"))
      .select(col("id").as("src"), col("dst"))
    val novel = fps.join(stored, Seq("w", "fp"), "left_anti")
    val newHubs = novel.groupBy(col("w"), col("fp"))
      .agg(min(col("id")).as("dst")).localCheckpoint()
    val edges = known
      .union(novel.join(newHubs, Seq("w", "fp"))
        .select(col("id").as("src"), col("dst")))
      .filter(col("src") =!= col("dst"))
    newHubs.write.mode("append").parquet(s"$path/hubs")
    val oldLabels = spark.read.parquet(s"$path/labels")
      .select(col("id"), col("cluster_id"))
    val labels = Components.connectedComponentsIncremental(
      oldLabels, batchIds, edges)
      .withColumn("__bucket", bucketOf(col("id"), nBuckets))
      .localCheckpoint() // one evaluation: changed-bucket probe + write
    try {
      val affected = labels
        .join(oldLabels.withColumnRenamed("cluster_id", "__old"),
          Seq("id"), "left_outer")
        .filter(col("__old").isNull || col("__old") =!= col("cluster_id"))
        .select(col("__bucket")).distinct().collect().map(_.getInt(0))
      if (affected.nonEmpty)
        labels
          .filter(col("__bucket")
            .isin(affected.map(Integer.valueOf).toIndexedSeq: _*))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__bucket").parquet(s"$path/labels")
    } finally labels.unpersist()
    newHubs.unpersist()
    ()
  }

  /** Replay-safe apply for STREAM-triggered ingestion
    * ([[graft.streaming.CcStream]]): foreachBatch delivery is
    * at-least-once, and a replayed micro-batch is byte-identical under
    * the stream checkpoint. Dispatch on how many batch ids the stored
    * labelling already holds:
    *
    *  - NONE labelled: the normal [[ccApply]] path with all its guards.
    *    This also covers a crash between the hub append and the label
    *    rewrite — the batch's own hubs resolve as "known", its novel-hub
    *    append is empty, and the rewrite converges (the [[ccApply]]
    *    contract).
    *  - ALL labelled: hubs land before labels, so a fully-labelled batch
    *    means the previous attempt committed everything — pure replay,
    *    nothing to do.
    *  - PARTIAL overlap cannot arise from checkpointed replay (batch
    *    composition is deterministic and the label rewrite commits as one
    *    job), so it fails fast as upstream corruption — the
    *    [[History.scd2ApplyOrReplay]] contract.
    */
  def ccApplyOrReplay(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String,
      windows: Seq[(Int, Int)] = Seq((1, 8), (5, 12))): Unit = {
    val ids = batch.select(col(idCol).cast("long").as("id")).localCheckpoint()
    try {
      val n = ids.count()
      val labelled = spark.read.parquet(s"$path/labels").select(col("id"))
        .join(ids, Seq("id"), "left_semi").count()
      if (labelled == 0L) ccApply(spark, path, batch, idCol, textCol, windows)
      else if (labelled != n) throw new IllegalStateException(
        s"ccApplyOrReplay: $labelled of $n batch ids are already " +
          "labelled — a checkpointed replay is all-or-nothing, so a " +
          "partial overlap means upstream corruption")
      // labelled == n: completed previous attempt — converged, no-op
    } finally { ids.unpersist(); () }
  }

  /** The stored labelling (id, cluster_id), bucket column dropped. */
  def ccRead(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/labels").drop("__bucket")

  /** Fold the hub table's per-apply append file sets into one write — the
    * store's only surface whose file count grows with apply count (labels
    * rewrite whole buckets through dynamic partition overwrite, so they
    * never accumulate). Hash-repartitioned on (w, fp) so the output file
    * count is bounded by `spark.sql.shuffle.partitions`, not by history.
    * Same staged-swap + crash-recovery contract as [[History.scd2Compact]]:
    * a stranded `__compact_tmp` with no live dir is promoted before
    * anything else, and the writer is single — an apply must not run
    * concurrently with compaction.
    */
  def ccCompact(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(s"$path/hubs")
    val tmp = new Path(s"$path/hubs__compact_tmp")
    if (!fs.exists(live) && fs.exists(tmp))
      require(fs.rename(tmp, live), s"ccCompact: recovery rename of $tmp failed")
    fs.delete(tmp, true)
    spark.read.parquet(live.toString)
      .repartition(col("w"), col("fp"))
      .write.parquet(tmp.toString)
    fs.delete(live, true)
    require(fs.rename(tmp, live), s"ccCompact: rename of $tmp failed")
  }
}
