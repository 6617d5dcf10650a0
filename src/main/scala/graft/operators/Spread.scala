package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive scan spreading (optimization guide §2.5 "input skew" /
  * §6 input-split sizing): a pipeline that does heavy per-row work BEFORE
  * its first exchange (gram explosion, token windows, binary decode)
  * inherits the SCAN's partitioning — and a small single-row-group parquet
  * file is one split, so the whole pre-shuffle stage serializes on one
  * core while the rest of the cluster idles.
  *
  * [[Spread.toCores]] repartitions such inputs up to the cluster's core
  * count ONLY when the source parallelism is actually below it — derived
  * from the frame's own partitioning at plan-build time, not a constant:
  * at production scale a corpus scan already carries ≥ cores partitions
  * and the call is a no-op (no shuffle inserted), so payload bytes are
  * never moved just to move them (guide §8's "move heavy rows once").
  * Hash-keyed so AQE's coalescing leaves it alone and retries stay
  * deterministic (guide §2.5 on rand-derived keys).
  */
object Spread {

  /** `df` repartitioned to `defaultParallelism` on `key` iff its current
    * partition count is lower; identity otherwise. */
  def toCores(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
