package graft.serving

import graft.functions.ColumnFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The dashboard/serving surface (SURVEY.md §3.4): the reference's four
  * requirement pages assemble SQL strings from UI state
  * (`weather-dashboard/app/pages/page1..4` and the app/queries SQL files);
  * here each
  * becomes a parameterized function over DataFrames — no string SQL, fully
  * optimizable, parameters are plain Scala values.
  *
  * All functions take the PREPARED weather frame (WeatherAnalytics.prepare
  * output joined or joinable to locations) and push their filters below the
  * aggregation — Catalyst moves them into the scan, so a year-partitioned
  * fact table gets partition pruning on every dashboard call.
  */
object DashboardQueries {

  private def joined(weather: DataFrame, locations: DataFrame): DataFrame =
    weather.join(broadcast(locations), Seq("location_id"))

  /** Optional-filter helper: AND-combine present predicates. */
  private def where(df: DataFrame, preds: Seq[Option[Column]]): DataFrame =
    preds.flatten.foldLeft(df)((d, p) => d.filter(p))

  // ── requirement 1: precipitation overview (requirement1_precipitation.sql) ──

  /** Per-district multi-metric rollup within an optional year range /
    * district set (`requirement1_precipitation.sql:13-46`).
    */
  def precipitationByDistrict(weather: DataFrame, locations: DataFrame,
      yearRange: Option[(Int, Int)] = None,
      districts: Option[Seq[String]] = None): DataFrame =
    where(joined(weather, locations), Seq(
      yearRange.map { case (a, b) => col("year").between(a, b) },
      districts.map(ds => col("city_name").isin(ds: _*))))
      .groupBy(col("city_name").as("district"))
      .agg(
        round(sum(col("precipitation_hours")), 2).as("total_precip_hours"),
        round(avg(col("precipitation_hours")), 2).as("avg_precip_hours"),
        round(min(col("precipitation_hours")), 2).as("min_precip_hours"),
        round(max(col("precipitation_hours")), 2).as("max_precip_hours"),
        count(lit(1)).as("n_days"),
        min(col("year")).as("first_year"),
        max(col("year")).as("last_year"))

  /** Monthly profile per district (page1 drill-down). */
  def precipitationMonthly(weather: DataFrame, locations: DataFrame,
      district: String): DataFrame =
    joined(weather, locations)
      .filter(col("city_name") === district)
      .groupBy(col("month"))
      .agg(round(avg(col("precipitation_hours")), 2).as("avg_precip_hours"))
      .orderBy(col("month"))

  /** Seasonal rollup with the dashboard's labeled season dialect
    * (`requirement1_precipitation.sql:27-30` — "Maha (Sep-Mar)").
    */
  def precipitationBySeason(weather: DataFrame, locations: DataFrame): DataFrame =
    joined(weather, locations)
      .groupBy(col("city_name").as("district"),
        seasonLabeled(col("month")).as("season"),
        seasonYear(col("year"), col("month")).as("season_year"))
      .agg(round(sum(col("precipitation_hours")), 2).as("total_precip_hours"))

  // ── requirement 2: top districts (requirement2_top_districts.sql) ──

  /** Top-k districts by total precipitation + their monthly detail
    * (the CTE top-k semi-join, `requirement2_top_districts.sql:30-45`).
    */
  def topDistrictsMonthly(weather: DataFrame, locations: DataFrame, k: Int = 5): DataFrame = {
    val j = joined(weather, locations)
    val top = j.groupBy(col("city_name"))
      .agg(sum(col("precipitation_hours")).as("total"))
      .orderBy(col("total").desc, col("city_name"))
      .limit(k)
      .select(col("city_name"))
    j.join(broadcast(top), Seq("city_name"), "left_semi")
      .groupBy(col("city_name").as("district"), yearMonth(col("date")).as("year_month"))
      .agg(round(sum(col("precipitation_hours")), 2).as("total_precip_hours"))
      .orderBy(col("district"), col("year_month"))
  }

  // ── requirement 3: hot-day percentages (requirement3_temperature_30.sql) ──

  /** % of days above `tempThreshold` per district×year / district / year —
    * the three grains of `requirement3_temperature_30.sql`.
    */
  def hotDayPct(weather: DataFrame, locations: DataFrame,
      tempThreshold: Double = 30.0,
      byDistrict: Boolean = true, byYear: Boolean = true): DataFrame = {
    val keys = (if (byDistrict) Seq(col("city_name").as("district")) else Seq.empty) ++
      (if (byYear) Seq(col("year")) else Seq.empty)
    val g = joined(weather, locations).groupBy(keys: _*)
    g.agg(
      count(lit(1)).as("total_days"),
      round(pctIf(col("temperature_2m_mean") > tempThreshold), 2).as("pct_hot_days"),
      countDistinct(col("city_name")).as("n_districts"))
  }

  // ── requirement 4: extreme weather (requirement4_extreme_weather.sql) ──

  /** Extreme-day counts with UI-tunable thresholds
    * (`requirement4_extreme_weather.sql:13-23`; thresholds 20–100 / 40–100).
    */
  def extremeWeatherSummary(weather: DataFrame, locations: DataFrame,
      precipThreshold: Double = 30.0, windThreshold: Double = 50.0): DataFrame =
    joined(weather, locations)
      .filter(isExtreme(col("precipitation_sum"), precipThreshold,
        col("wind_gusts_10m_max"), windThreshold))
      .groupBy(col("city_name").as("district"))
      .agg(
        count(lit(1)).as("extreme_days"),
        round(avg(col("precipitation_sum")), 2).as("avg_precip"),
        round(avg(col("wind_gusts_10m_max")), 2).as("avg_wind_gust"))

  /** Severity-classified day counts (3-way CASE with scaled thresholds,
    * `requirement4_extreme_weather.sql:52-56`).
    */
  def severityBreakdown(weather: DataFrame,
      precipThreshold: Double = 30.0, windThreshold: Double = 50.0): DataFrame =
    weather
      .groupBy(severity(col("precipitation_sum"), precipThreshold,
        col("wind_gusts_10m_max"), windThreshold).as("severity"))
      .agg(count(lit(1)).as("n_days"))

  /** Recent candidate-extreme scatter sample: disjunctive prefilter +
    * recency LIMIT (`page4_extreme_weather.py:227-231`).
    */
  def extremeScatterSample(weather: DataFrame,
      precipThreshold: Double = 30.0, windThreshold: Double = 50.0,
      limit: Int = 1000): DataFrame =
    weather
      .filter(col("precipitation_sum") > 0.7 * precipThreshold ||
        col("wind_gusts_10m_max") > 0.8 * windThreshold)
      .orderBy(col("date").desc, col("location_id"))
      .limit(limit)
      .select(col("date"), col("location_id"),
        col("precipitation_sum"), col("wind_gusts_10m_max"))
}
