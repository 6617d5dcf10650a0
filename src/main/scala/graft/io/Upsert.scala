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
    * (broadcast when updates are small) + union.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target
      .join(broadcast(updates.select(keys.map(col): _*).distinct()), keys, "left_anti")
      .unionByName(updates)

  /** Partition-pruned in-place upsert: merge `updates` into the
    * `partitionCol`-partitioned parquet table at `path`, rewriting only
    * affected partitions (dynamic partition overwrite). Partitions not
    * named by any update row are never read or written.
    */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String], partitionCol: String): Unit = {
    val parts = updates.select(col(partitionCol)).distinct()
    val affected = spark.read.parquet(path)
      .join(broadcast(parts), Seq(partitionCol), "left_semi")
    val merged = upsert(affected, updates, keys)
      // sever lineage from `path`: Spark refuses to overwrite a path its
      // own plan reads; materializing the (partition-pruned, small) merge
      // result first is the batch-parquet equivalent of a staged commit
      .localCheckpoint(true)
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
  }
}
