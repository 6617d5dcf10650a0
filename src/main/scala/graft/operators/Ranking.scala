package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / top-k operators generalizing the reference's patterns:
  *  - top-N per group via `row_number` window
  *    (`/root/reference/src/spark/weather_spark_analysis_new.py:363-367`)
  *  - global argmax with deterministic tie-break
  *    (`/root/reference/src/mapreduce/HighestPrecipitationMonth.java:89-115`)
  *  - CTE top-k semi-join (`requirement2_top_districts.sql:30-45`)
  *
  * Scale notes: `topKPerGroup` shuffles once on the partition keys — the
  * window sort happens within partitions and never materializes a global
  * sort. `argmax` reduces via partial aggregation to one row. The reference's
  * single-reducer argmax (`setNumReduceTasks(1)`) becomes a two-level
  * aggregate with map-side combine — no single-node bottleneck at 100 TB.
  */
object Ranking {

  /** Keep the top `k` rows per group, ranked by `order` (add unique key
    * columns as tie-breakers for determinism — the reference's unbroken ties
    * are called out as nondeterministic in SURVEY.md §7.4).
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], order: Seq[Column], k: Int,
      rankCol: String = "rank"): DataFrame =
    df.withColumn(rankCol, row_number().over(Window.partitionBy(partitionBy: _*).orderBy(order: _*)))
      .filter(col(rankCol) <= k)

  /** Single-row global argmax of `value` after grouping by `key`:
    * the row whose aggregated value is highest, ties broken by smallest key.
    */
  def argmax(df: DataFrame, key: Column, value: Column, keyName: String, valueName: String): DataFrame =
    df.groupBy(key.as(keyName))
      .agg(value.as(valueName))
      .orderBy(col(valueName).desc, col(keyName))
      .limit(1)

  /** Filter `fact` to rows whose `keys` appear in the top-k of `ranked`
    * (ordered by `order` desc with tie-breaks) — the CTE-top-k semi-join.
    * The k-row key set broadcasts, so the fact table is filtered without a
    * shuffle.
    */
  def topKSemiJoin(fact: DataFrame, ranked: DataFrame, keys: Seq[String],
      order: Seq[Column], k: Int): DataFrame = {
    val top = ranked.orderBy(order: _*).limit(k).select(keys.map(col): _*)
    fact.join(broadcast(top), keys, "left_semi")
  }
}
