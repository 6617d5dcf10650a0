package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch MERGE/upsert over parquet — the keyed-refresh step of every
  * incremental pipeline (the reference's watermarked re-load folders are
  * the degenerate append-only case; this is the general key-replace form).
  *
  * Scale shape: the rewrite touches ONLY the partitions that `updates`
  * lands in — untouched partitions keep their files byte-identical
  * (asserted in UpsertSpec). On a real deployment a transactional table
  * format supplies the commit protocol; the partition-pruned
  * read-merge-dynamic-overwrite cycle here is the same data movement.
  */
object Upsert {

  /** Key-based upsert as a relational expression: target rows whose key
    * collides with an update are replaced, new keys append. One anti-join
    * + union; the join strategy is left to the planner — with AQE the
    * distinct key set broadcasts automatically when it is small, and a
    * large update batch degrades gracefully to a shuffled join instead of
    * forcing an OOM-prone driver broadcast.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target
      .join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates)

  /** Partition-pruned in-place upsert: merge `updates` into the
    * `partitionCol`-partitioned parquet table at `path`, rewriting only
    * affected partitions (dynamic partition overwrite).
    *
    * Affected = partitions named by the updates UNION partitions where an
    * updated key currently lives — a key whose update carries a NEW
    * partition value still gets its old row rewritten away (no silent
    * duplicate after a key moves partition). Locating the old rows costs a
    * (key, partition)-projected column-pruned scan of the target; pass
    * `assumeStablePartitions = true` to skip it when the caller guarantees
    * partitionCol is immutable per key (the common time-partitioned case),
    * restoring pure update-side pruning.
    */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String], partitionCol: String,
      assumeStablePartitions: Boolean = false): Unit = {
    val target = spark.read.parquet(path)
    val updateParts = updates.select(col(partitionCol)).distinct()
    val parts =
      if (assumeStablePartitions) updateParts
      else {
        val keyCols = keys.map(col)
        val oldParts = target
          .select(keyCols :+ col(partitionCol): _*)
          .join(updates.select(keyCols: _*).distinct(), keys, "left_semi")
          .select(col(partitionCol)).distinct()
        updateParts.union(oldParts).distinct()
      }
    val affected = target.join(broadcast(parts), Seq(partitionCol), "left_semi")
    val merged = upsert(affected, updates, keys)
      // sever lineage from `path`: Spark refuses to overwrite a path its
      // own plan reads; materializing the (partition-pruned, small) merge
      // result first is the batch-parquet equivalent of a staged commit
      .localCheckpoint(true)
    // Partition values compared in SPARK-CAST string space on both sides:
    // the writer renders a partition directory from Cast(value, string)
    // (then path-escapes it), so a JVM toString — whose rendering diverges
    // for e.g. fractional-second timestamps — must never enter the compare.
    // null partitions render as the writer's DEFAULT_PARTITION_NAME.
    val u = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    def valStrs(df: DataFrame): Set[String] =
      df.select(col(partitionCol).cast("string")).distinct().collect()
        .map { r =>
          val s = if (r.isNullAt(0)) null else r.getString(0)
          // the writer folds null AND "" into the same default bucket
          if (s == null || s.isEmpty) u.DEFAULT_PARTITION_NAME else s
        }
        .toSet
    // collected BEFORE the overwrite below invalidates this plan's input
    // files (parts reads the pre-overwrite table)
    val affectedVals = valStrs(parts)
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)

    // dynamic overwrite only rewrites partitions PRESENT in the output —
    // an affected partition whose merged result is empty (its only rows
    // moved away) would silently keep its stale files. Both sides here
    // are affected-partition-sized (bounded by the update batch). The
    // stale directories are found by LISTING what is actually on disk and
    // decoding each name, never by re-deriving an escaped name.
    val writtenVals = valStrs(merged.select(col(partitionCol)))
    val emptied = affectedVals -- writtenVals
    if (emptied.nonEmpty) {
      import org.apache.hadoop.fs.Path
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prefix = u.escapePathName(partitionCol) + "="
      fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
        .foreach { st =>
          val decoded = u.unescapePathName(st.getPath.getName.drop(prefix.length))
          if (emptied.contains(decoded)) fs.delete(st.getPath, true)
        }
    }
  }
}
