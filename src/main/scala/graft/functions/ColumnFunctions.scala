package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure `Column` combinators (NOT UDFs — they stay fully inside Catalyst and
  * whole-stage codegen) re-expressing the reference's scalar-function surface.
  *
  * Reference semantics (SURVEY.md §2.8):
  *  - season classification: `/root/reference/src/hive/03_query2_evapotranspiration.hql:15-18`
  *  - season-year shift (Jan–Mar belongs to PREVIOUS year's Maha):
  *    `03_query2_evapotranspiration.hql:19-22`
  *  - year-month key: `src/mapreduce/DistrictMonthlyWeather.java:80-82`
  *  - severity 3-way CASE: `weather-dashboard/.../requirement4_extreme_weather.sql:52-56`
  *  - extreme-weather conjunctive predicate: `requirement4_extreme_weather.sql:14-15`
  *  - conditional percentage: `requirement3_temperature_30.sql:8-9`
  *  - abs-deviation ranking metric: `src/hive/02_query1_top_cities.hql:12`
  */
object ColumnFunctions {

  /** Months assigned to the "Maha" season in the reference (Sep–Mar). */
  private val mahaMonths: Seq[Int] = Seq(1, 2, 3, 9, 10, 11, 12)

  /** Season classification from a month number (1-12). */
  def season(month: Column): Column =
    when(month.isin(mahaMonths: _*), "Maha").otherwise("Yala")

  /** Dashboard label dialect (`requirement1_precipitation.sql:27-30`). */
  def seasonLabeled(month: Column): Column =
    when(month.isin(mahaMonths: _*), "Maha (Sep-Mar)").otherwise("Yala (Apr-Aug)")

  /** Season-year: Jan–Mar is attributed to the PREVIOUS year's season —
    * the load-bearing semantic at `03_query2_evapotranspiration.hql:19-22`.
    */
  def seasonYear(year: Column, month: Column): Column =
    when(month.isin(1, 2, 3), year - 1).otherwise(year)

  /** Canonical `yyyy-MM` key (zero-padded month). */
  def yearMonth(ts: Column): Column = date_format(ts, "yyyy-MM")

  /** Conjunctive "extreme" predicate with tunable thresholds. */
  def isExtreme(a: Column, aThreshold: Double, b: Column, bThreshold: Double): Column =
    (a > aThreshold) && (b > bThreshold)

  /** 3-way severity CASE. Severe if both scaled thresholds exceeded,
    * Moderate if the base predicate holds, else Normal.
    */
  def severity(a: Column, aT: Double, b: Column, bT: Double): Column =
    when(a > aT * 1.5 && b > bT * 1.3, "Severe")
      .when(a > aT && b > bT, "Moderate")
      .otherwise("Normal")

  /** Percentage of rows in the group satisfying `cond` (aggregate). */
  def pctIf(cond: Column): Column =
    sum(when(cond, 1).otherwise(0)) * 100.0 / count(lit(1))

  /** |aggregated value − target| ranking metric ("most temperate" = closest
    * to 22°C in the reference; generalized to any target).
    */
  def absDeviation(value: Column, target: Double): Column =
    abs(value - lit(target))

  /** Parity round: `round(x + 1e-8, d)`, mirrored verbatim in the DuckDB
    * oracles. The corpus's 2-decimal money values make averages land
    * EXACTLY on rounding midpoints (e.g. sum_cents/20 → x.005), where
    * Spark (BigDecimal HALF_UP on the shortest decimal repr) and DuckDB
    * (`nearbyint(x*100)/100`) legitimately disagree. The epsilon shifts
    * every such rational midpoint off-center by far more than any
    * cross-engine summation-order spread (~1e-12) while staying far below
    * the value grid (≥1e-6 for group counts here), so both engines always
    * round identically.
    */
  def pround(c: Column, d: Int): Column = round(c + lit(1e-8), d)
}
