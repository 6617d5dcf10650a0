package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: lay the (deterministically
  * shuffled) document stream end-to-end and chop it into fixed
  * token-budget sequences — each document is assigned to the sequence
  * whose budget window contains its first token, with its offset inside
  * that window. The downstream trainer then materializes one sequence per
  * `seq_id` (documents crossing a boundary continue into the next window,
  * the standard "packed" pretraining layout).
  *
  * The global running token count is a distributed two-phase prefix sum,
  * NOT a global `Window.orderBy` (which Spark executes on a single
  * partition — the canonical scale killer for exactly this computation):
  *
  *  1. range-partition by the deterministic order key, per-partition
  *     running sums via a window PARTITIONED by `spark_partition_id()`;
  *  2. the per-partition totals (one row per partition) get a running
  *     offset on the driver-sized side and broadcast back.
  *
  * The result is identical for any partition count — asserted as a law in
  * PackingSpec — and every stage shuffles only (id, n_tok) pairs.
  */
object Packing {

  /** Deterministic mixing order: md5 of the id rendered as text — stable
    * across engines (the DuckDB oracle replays it), runs, and partition
    * layouts, and uncorrelated with ingest order.
    */
  def mixOrder(id: Column): Column = md5(id.cast("string"))

  /** Assign each row to a training sequence of `budget` tokens.
    *
    * Output: (idCol, n_tok, seq_id, offset_in_seq) where
    * seq_id = floor(start / budget), offset_in_seq = start % budget, and
    * start is the row's first-token position in the md5-shuffled global
    * token stream.
    */
  def packSequences(docs: DataFrame, idCol: String, nTok: Column,
      budget: Long): DataFrame = {
    require(budget > 0)
    val spark = docs.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions

    val ordered = docs
      .select(col(idCol), nTok.cast("long").as("n_tok"))
      .withColumn("ord", mixOrder(col(idCol)))
      .repartitionByRange(nPart, col("ord"), col(idCol))
      .withColumn("pid", spark_partition_id())
      // both phases below consume this frame; spark_partition_id() is
      // nondeterministic and range boundaries are sampled per physical
      // exchange, so the pid column must be computed exactly ONCE — a lazy
      // local checkpoint pins both branches (and any recompute) to a single
      // materialized copy instead of leaning on exchange reuse. Rows are
      // narrow (id, n_tok, ord, pid), so the persisted copy is cheap.
      .localCheckpoint(false)

    // phase 1: running sum inside each range partition. The window's
    // partitionBy("pid") re-shuffles by pid, keeping each range partition
    // intact; only (id, n_tok, ord, pid) rows move.
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ordered.withColumn("local_cum", sum(col("n_tok")).over(wLocal))

    // phase 2: one row per partition — running offset of all earlier
    // partitions. Totals come from `ordered` (not the windowed side) so
    // this branch partial-aggregates to nPart rows BEFORE its exchange
    // instead of replaying the corpus-wide sort+window; the
    // single-partition window here is over nPart rows, not the corpus.
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ordered.groupBy(col("pid"))
      .agg(sum(col("n_tok")).as("ptotal"))
      .withColumn("poffset", coalesce(sum(col("ptotal")).over(wOff), lit(0L)))
      .select(col("pid"), col("poffset"))

    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("start", col("local_cum") + col("poffset") - col("n_tok"))
      .select(col(idCol), col("n_tok"),
        floor(col("start") / budget).as("seq_id"),
        (col("start") % budget).as("offset_in_seq"))
  }

  /** Curriculum batching: rank every row GLOBALLY by (`orderKey` asc,
    * id asc) and cut the order into training batches of `batchSize` —
    * e.g. orderKey = token count gives the classic short-to-long length
    * curriculum. The global rank uses the same two-phase distributed
    * prefix sum as [[packSequences]] (range-partition on the key, count
    * per partition, driver-sized offsets broadcast back) — never a
    * single-partition global sort, so a billion rows rank in parallel.
    * The (id → global_pos) mapping is the mathematical rank, so it is
    * invariant to partition count (law in PackingSpec) and replayable by
    * any engine's row_number.
    *
    * Output: (idCol, order_key, global_pos, batch_id, pos_in_batch).
    */
  def curriculumBatches(docs: DataFrame, idCol: String, orderKey: Column,
      batchSize: Int): DataFrame = {
    require(batchSize > 0)
    val spark = docs.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val ordered = docs
      .select(col(idCol), orderKey.cast("long").as("order_key"))
      .repartitionByRange(nPart, col("order_key"), col(idCol))
      .withColumn("pid", spark_partition_id())
      // same single-materialization requirement as packSequences: pid is
      // nondeterministic, both phases must see one copy
      .localCheckpoint(false)
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("order_key"), col(idCol))
    val local = ordered.withColumn("local_rn",
      row_number().over(wLocal).cast("long"))
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ordered.groupBy(col("pid"))
      .agg(count(lit(1)).as("ptotal"))
      .withColumn("poffset", coalesce(sum(col("ptotal")).over(wOff), lit(0L)))
      .select(col("pid"), col("poffset"))
    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("global_pos", col("local_rn") + col("poffset") - 1)
      .select(col(idCol), col("order_key"), col("global_pos"),
        expr(s"global_pos DIV $batchSize").as("batch_id"),
        (col("global_pos") % batchSize).as("pos_in_batch"))
  }
}
