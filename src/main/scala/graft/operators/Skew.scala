package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for 100 TB-scale shuffles.
  *
  * AQE's skew-join splitting (on by default) covers joins; hot-key
  * AGGREGATIONS still funnel one key's rows into one task. [[saltedAgg]]
  * is the classic two-stage fix: stage 1 aggregates on (key, salt) —
  * spreading a hot key over `salts` tasks — stage 2 merges the partials.
  * Works for any algebraic aggregate (sum/count/min/max; avg = sum+count
  * merged at stage 2).
  */
object Skew {

  /** Two-stage salted sum/count aggregation.
    *
    * @param aggs (columnName, "sum"|"count"|"min"|"max") pairs
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], salts: Int,
      aggs: Seq[(String, String)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val stage1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(
        aggs.head match { case (c, f) => partial(c, f) },
        aggs.tail.map { case (c, f) => partial(c, f) }: _*)
    stage1
      .groupBy(keys: _*)
      .agg(
        aggs.head match { case (c, f) => merge(c, f) },
        aggs.tail.map { case (c, f) => merge(c, f) }: _*)
  }

  private def partial(c: String, f: String): Column = f match {
    case "sum"   => sum(col(c)).as(s"__p_$c")
    case "count" => count(col(c)).as(s"__p_$c")
    case "min"   => min(col(c)).as(s"__p_$c")
    case "max"   => max(col(c)).as(s"__p_$c")
  }

  private def merge(c: String, f: String): Column = f match {
    case "sum"   => sum(col(s"__p_$c")).as(s"sum_$c")
    case "count" => sum(col(s"__p_$c")).as(s"count_$c")
    case "min"   => min(col(s"__p_$c")).as(s"min_$c")
    case "max"   => max(col(s"__p_$c")).as(s"max_$c")
  }

  /** Broadcast-salted join for a skewed fact⋈dim where the dim is too big
    * to broadcast whole but a FEW fact keys are hot: replicate only the
    * hot dim rows `salts` times, salt the matching fact rows, join on
    * (key, salt). Non-hot keys join with salt 0 — no replication cost.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      hotKeys: Seq[Any], salts: Int): DataFrame = {
    val saltF = when(col(key).isin(hotKeys: _*),
      pmod(monotonically_increasing_id(), lit(salts))).otherwise(lit(0L))
    val factS = fact.withColumn("__salt", saltF)
    // generators can't sit inside CASE: replicate hot dim rows via a
    // filtered explode, keep cold rows single with salt 0
    val hot = dim.filter(col(key).isin(hotKeys: _*))
      .withColumn("__salt", explode(lit((0L until salts.toLong).toArray)))
    val cold = dim.filter(!col(key).isin(hotKeys: _*)).withColumn("__salt", lit(0L))
    factS.join(hot.unionByName(cold), Seq(key, "__salt")).drop("__salt")
  }
}
