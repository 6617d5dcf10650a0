package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for corpus curation at scale: deterministic
  * hash-based sampling (reproducible across runs and engines, unlike
  * `df.sample`'s RNG which depends on partitioning) and per-stratum
  * quota sampling.
  */
object Sampling {

  /** Keep a deterministic ~`fraction` of rows, selected by key hash —
    * the reproducible alternative to `sample()`: the same key always gets
    * the same verdict, on any cluster, any partitioning.
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    val buckets = 1000000L
    df.filter(pmod(xxhash64(col(keyCol)), lit(buckets)) < (fraction * buckets).toLong)
  }

  /** Exactly `quota` rows per stratum (fewer if the stratum is smaller),
    * chosen deterministically by key hash order — bounded output per
    * group regardless of skew.
    */
  def stratifiedQuota(df: DataFrame, stratumCol: String, keyCol: String,
      quota: Int): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(xxhash64(col(keyCol)), col(keyCol))))
      .filter(col("__rn") <= quota)
      .drop("__rn")

  /** Frequent-items profile per column (Spark's stat.freqItems — the
    * Karp-Papadimitriou-Shenker sketch): items with frequency above
    * `support`, per column. One pass, no shuffle of raw data.
    */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double): DataFrame =
    df.stat.freqItems(cols.toArray, support)
}
