package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history construction from a change
  * event stream — the warehouse side of CDC ingestion: collapse an
  * append-only event log into versioned validity intervals per entity
  * (one row per *run* of an unchanged attribute value, with
  * [valid_from, valid_to) bounds and a current flag).
  *
  * Scale shape: one shuffle on the entity key; everything else is two
  * windows over the already-partitioned data (change detection by lag,
  * then a run-length group-by and a lead for the closing bound). No
  * self-join against the full history — the classic O(n²) SCD2
  * anti-pattern — and no global order: windows are per-entity, so a
  * billion entities parallelize across the cluster.
  */
object History {

  /** Build SCD2 intervals for `attrCol` per `keyCol`, ordered by
    * (`tsCol`, `tieCol`). Consecutive events with the SAME attribute value
    * collapse into one version; a change opens a new one.
    *
    * Output: (key, version, attr, valid_from, valid_to, n_events,
    * is_current) — valid_to is null on the open (current) version.
    */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // 1 where the attribute differs from the previous event (first row: 1);
    // materialized as its own projection — Spark does not allow the lag()
    // window expression nested inside the running-sum window aggregate
    val changed = when(
      lag(col(attrCol), 1).over(byTime).isNull ||
        lag(col(attrCol), 1).over(byTime) =!= col(attrCol), 1).otherwise(0)
    val versioned = events
      .withColumn("__chg", changed)
      .withColumn("version",
        sum(col("__chg")).over(byTime.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("long"))
    val runs = versioned
      .groupBy(col(keyCol), col("version"))
      .agg(max(col(attrCol)).as(attrCol), // constant within the run
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
