package graft

import graft.serving.DashboardQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Serving-layer tests on a crafted weather frame (pre-prepared shape). */
class DashboardQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (location_id, date, year, month, precip_hours, precip_sum, wind_gust, temp_mean)
  lazy val weather = Seq(
    (1, "2020-01-10", 2020, 1, 5.0, 40.0, 60.0, 31.0), // extreme + hot
    (1, "2020-02-10", 2020, 2, 3.0, 10.0, 20.0, 29.0),
    (1, "2021-06-10", 2021, 6, 8.0, 50.0, 70.0, 33.0), // extreme + hot
    (2, "2020-01-11", 2020, 1, 1.0, 5.0, 10.0, 25.0),
    (2, "2021-07-11", 2021, 7, 2.0, 80.0, 90.0, 35.0), // extreme + hot
  ).toDF("location_id", "dateStr", "year", "month",
      "precipitation_hours", "precipitation_sum", "wind_gusts_10m_max", "temperature_2m_mean")
    .withColumn("date", to_date($"dateStr"))

  lazy val locations = Seq((1, "Colombo"), (2, "Kandy")).toDF("location_id", "city_name")

  test("precipitationByDistrict with year range + district filter") {
    val all = DashboardQueries.precipitationByDistrict(weather, locations)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(all === Map("Colombo" -> 16.0, "Kandy" -> 3.0))

    val filtered = DashboardQueries.precipitationByDistrict(weather, locations,
      yearRange = Some((2020, 2020)), districts = Some(Seq("Colombo")))
      .collect()
    assert(filtered.length === 1)
    assert(filtered.head.getDouble(1) === 8.0) // 2020 Colombo only
  }

  test("precipitationBySeason uses the labeled dialect + season year") {
    val rows = DashboardQueries.precipitationBySeason(weather, locations).collect()
    val seasons = rows.map(_.getString(1)).toSet
    assert(seasons.subsetOf(Set("Maha (Sep-Mar)", "Yala (Apr-Aug)")))
    // Jan 2020 -> Maha season_year 2019
    assert(rows.exists(r => r.getString(0) == "Colombo" &&
      r.getString(1) == "Maha (Sep-Mar)" && r.getInt(2) == 2019))
  }

  test("topDistrictsMonthly: only top-k districts survive") {
    val got = DashboardQueries.topDistrictsMonthly(weather, locations, k = 1)
    assert(got.select("district").distinct().collect().map(_.getString(0)).toSeq === Seq("Colombo"))
  }

  test("hotDayPct: conditional percentage per district") {
    val got = DashboardQueries.hotDayPct(weather, locations, 30.0, byDistrict = true, byYear = false)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("Colombo") === round2(2.0 / 3 * 100)) // 31, 33 hot of 3
    assert(got("Kandy") === 50.0)
  }

  private def round2(x: Double) = math.rint((x + 1e-8) * 100) / 100

  test("extremeWeatherSummary honors tunable thresholds") {
    val strict = DashboardQueries.extremeWeatherSummary(weather, locations, 30, 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(strict === Map("Colombo" -> 2, "Kandy" -> 1))
    // row 4 has precipitation_sum exactly 5.0 — the predicate is strictly
    // greater-than, so it stays excluded
    val loose = DashboardQueries.extremeWeatherSummary(weather, locations, 5, 5)
    assert(loose.agg(sum($"extreme_days")).head().getLong(0) === 4)
  }

  test("severityBreakdown 3-way classification") {
    val got = DashboardQueries.severityBreakdown(weather, 30, 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Severe: precip>45 && wind>65 -> rows 3 (50,70) and 5 (80,90)
    assert(got("Severe") === 2)
    assert(got("Moderate") === 1) // row 1 (40,60)
    assert(got("Normal") === 2)
  }

  test("extremeScatterSample: disjunctive prefilter + recency limit") {
    val got = DashboardQueries.extremeScatterSample(weather, 30, 50, limit = 2).collect()
    assert(got.length === 2)
    // newest first: 2021-07-11 then 2021-06-10
    assert(got.head.getAs[java.sql.Date]("date").toString === "2021-07-11")
  }
}
