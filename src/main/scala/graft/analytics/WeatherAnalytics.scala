package graft.analytics

import graft.functions.ColumnFunctions._
import graft.operators.Ranking
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's six analytics pipelines (SURVEY.md §3, §1.4) as pure
  * `DataFrame => DataFrame` transforms over the weather fact + location
  * dimension schemas (FIXTURES.md). Each replaces an entire multi-process
  * relay (MapReduce job + loader, or Hive statement + shell glue) with a
  * single declarative plan; every semantic trap from SURVEY §7.4 is
  * reproduced and unit-tested in WeatherAnalyticsSpec:
  *
  *  - Maha season-year shift (Jan–Mar → previous year)
  *  - "temperate" = |avg max temp − 22°C|, not minimum
  *  - top-3 (not top-1) hottest months, deterministic tie-break
  *  - ISO weekofyear (week 1 can appear under December)
  *  - null/regex-validity filters before aggregation
  *
  * Scale: the location dim broadcasts everywhere; every aggregate is
  * partial+final; the hottest-month key set broadcasts before the weekly
  * rollup, so the fact table shuffles exactly once per pipeline.
  */
object WeatherAnalytics {

  /** Ingest prep: one canonical date parse (SURVEY §1.2 — three reference
    * subsystems each re-parsed `M/D/YYYY`), derived parts, raw string kept
    * as `dt` for the reference's regex-validity predicate.
    */
  def prepare(weatherRaw: DataFrame): DataFrame =
    weatherRaw
      .withColumn("dt", col("date").cast("string"))
      .withColumn("date", try_to_date(col("dt"), "M/d/yyyy")) // ANSI-safe: null on bad input
      // unparsable dates dropped at ingest — DROPMALFORMED extended to the
      // date column (the reference's MR path swallows such rows, its Hive
      // path keeps garbage month numbers; we pick the former, documented)
      .filter(col("date").isNotNull)
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
      .withColumn("week", weekofyear(col("date")))

  /** MR job 1 (`DistrictMonthlyWeather.java:33-146` + 543-line loader):
    * per (district, year-month) total precipitation hours + mean temp.
    */
  def districtMonthly(weather: DataFrame, locations: DataFrame): DataFrame =
    weather
      .join(broadcast(locations), Seq("location_id"))
      .groupBy(col("city_name").as("district"), yearMonth(col("date")).as("year_month"))
      .agg(
        round(sum(col("precipitation_hours")), 2).as("total_precip_hours"),
        round(avg(col("temperature_2m_mean")), 2).as("mean_temperature"))

  /** MR job 2 (`HighestPrecipitationMonth.java`): global argmax month by
    * total precipitation hours — partial agg, no single-reducer bottleneck.
    */
  def highestPrecipitationMonth(weather: DataFrame): DataFrame =
    Ranking.argmax(weather,
      yearMonth(col("date")), round(sum(col("precipitation_hours")), 2),
      "year_month", "total_precip_hours")

  /** Hive q1 (`02_query1_top_cities.hql`): top-10 cities whose average max
    * temperature is closest to 22°C (the deviation metric is computed on
    * the unrounded average, as the live query does).
    */
  def topTemperateCities(weather: DataFrame, locations: DataFrame, k: Int = 10): DataFrame =
    weather
      .filter(col("temperature_2m_max").isNotNull)
      .join(broadcast(locations), Seq("location_id"))
      .groupBy(col("city_name"))
      .agg(
        round(avg(col("temperature_2m_max")), 2).as("avg_max_temp"),
        absDeviation(avg(col("temperature_2m_max")), 22.0).as("temp_deviation"))
      .orderBy(col("temp_deviation"), col("city_name"))
      .limit(k)

  /** Hive q2 (`03_query2_evapotranspiration.hql`): seasonal average ET0
    * with the Maha season-year shift and the regex date-validity filter.
    */
  def seasonalEvapotranspiration(weather: DataFrame, locations: DataFrame): DataFrame =
    weather
      .filter(col("et0_fao_evapotranspiration").isNotNull && col("dt").isNotNull &&
        col("dt").rlike("^[0-9]+/[0-9]+/[0-9]+$"))
      .join(broadcast(locations), Seq("location_id"))
      .groupBy(
        col("city_name"),
        season(col("month")).as("season"),
        seasonYear(col("year"), col("month")).as("season_year"))
      .agg(round(avg(col("et0_fao_evapotranspiration")), 2).as("avg_et0"))

  /** Spark task 2.3a (`weather_spark_analysis_new.py:316-338`): per
    * year×month radiation stats with conditional-count percentage.
    */
  def radiationAnalysis(weather: DataFrame, threshold: Double = 15.0): DataFrame =
    weather
      .groupBy(col("year"), col("month"))
      .agg(
        count(lit(1)).as("total_days"),
        sum(when(col("shortwave_radiation_sum") > threshold, 1).otherwise(0)).as("days_above_threshold"),
        round(avg(col("shortwave_radiation_sum")), 2).as("avg_radiation"))
      .withColumn("pct_above",
        round(col("days_above_threshold") * 100.0 / col("total_days"), 2))
      .orderBy(col("year"), col("month"))

  /** Spark task 2.3b (`weather_spark_analysis_new.py:358-402`): weekly max
    * temperature within each year's top-3 hottest months. The reference's
    * unbroken rank ties are nondeterministic (SURVEY §7.4c) — we add the
    * month as tie-breaker and document the deviation.
    */
  def weeklyMaxTempHottestMonths(weather: DataFrame, locations: DataFrame,
      topMonths: Int = 3): DataFrame = {
    val monthly = weather
      .groupBy(col("year"), col("month"))
      .agg(avg(col("temperature_2m_max")).as("avg_max_temp"))
    val hottest = monthly
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("year")).orderBy(col("avg_max_temp").desc, col("month"))))
      .filter(col("rank") <= topMonths)
      .select("year", "month")
    weather
      .join(broadcast(hottest), Seq("year", "month"))
      .join(broadcast(locations), Seq("location_id"))
      .groupBy(col("year"), col("month"), col("week"), col("city_name"))
      .agg(
        round(max(col("temperature_2m_max")), 2).as("max_temp"),
        round(avg(col("temperature_2m_max")), 2).as("avg_temp"),
        count(lit(1)).as("days_counted"))
      .orderBy(col("year"), col("month"), col("week"), col("city_name"))
  }
}
