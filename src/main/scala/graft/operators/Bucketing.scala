package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins (the "reuse a partitioning across stages"
  * lever): write both sides bucketed by the join key into the session
  * catalog; subsequent equi-joins on that key read bucket-aligned files
  * and skip the shuffle entirely (SortMergeJoin with zero Exchange).
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * per query and shuffling it once at write time — the standard layout for
  * a fact table joined repeatedly on the same key.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two previously-bucketed tables on their bucket key. The caller
    * can assert shuffle-freedom via [[countShuffles]].
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Number of shuffle exchanges in a plan (AQE-resolved). */
  def countShuffles(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    var n = 0
    plan.foreach {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => n += 1
      case _ => ()
    }
    n
  }
}
