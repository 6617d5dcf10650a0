package graft

import graft.app.WeatherRunner
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: CSVs in, the ten-table catalog (§1.4, minus the two
  * ML-run tables) out, one call.
  */
class WeatherRunnerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("runAll produces the full result-table catalog from raw CSVs") {
    val dir = Files.createTempDirectory("graft_runner").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/weather.csv"),
      """location_id,date,weather_code (wmo code),temperature_2m_max (°C),temperature_2m_min (°C),temperature_2m_mean (°C),apparent_temperature_max (°C),apparent_temperature_min (°C),apparent_temperature_mean (°C),daylight_duration (s),sunshine_duration (s),precipitation_sum (mm),rain_sum (mm),precipitation_hours (h),wind_speed_10m_max (km/h),wind_gusts_10m_max (km/h),wind_direction_10m_dominant (°),shortwave_radiation_sum (MJ/m²),et0_fao_evapotranspiration (mm),sunrise,sunset
        |1,1/5/2010,61,31.2,24.1,27.4,33.0,26.2,29.1,42300.5,28800.0,12.4,12.0,6.5,14.2,38.9,225.0,18.2,4.1,06:21,18:05
        |1,4/10/2010,0,33.0,25.0,29.0,35.0,27.0,31.0,43000.0,30000.0,0.0,0.0,2.0,10.0,20.0,180.0,22.0,6.0,06:00,18:20
        |2,12/28/2014,63,29.8,23.5,26.1,31.1,25.0,27.8,41900.0,10800.0,45.7,44.2,18.0,22.6,61.3,240.0,9.8,2.2,06:19,18:01
        |""".stripMargin)
    Files.writeString(java.nio.file.Path.of(s"$dir/locations.csv"),
      """location_id,latitude,longitude,elevation,utc_offset_seconds,timezone,timezone_abbreviation,city_name
        |1,6.93,79.85,8.0,19800,Asia/Colombo,+0530,Colombo
        |2,7.29,80.63,500.0,19800,Asia/Colombo,+0530,Kandy
        |""".stripMargin)

    val counts = WeatherRunner.runAll(spark,
      s"$dir/weather.csv", s"$dir/locations.csv", s"$dir/out")

    assert(counts("raw_weather_data") === 3)
    assert(counts("locations") === 2)
    assert(counts("district_monthly_weather") === 3) // (Colombo,2010-01/04),(Kandy,2014-12)
    assert(counts("highest_precipitation") === 1)
    assert(counts("top_temperate_cities") === 2)
    assert(counts("evapotranspiration_by_season") === 3)
    assert(counts("radiation_analysis") === 3)
    assert(counts("weekly_max_temp_hottest_months") >= 3)

    // spot value through the stored table: argmax month is Dec 2014
    val hp = spark.read.parquet(s"$dir/out/highest_precipitation").head()
    assert(hp.getString(0) === "2014-12")
    assert(hp.getDouble(1) === 18.0)

    // HiveQL-parity: the reference's Query 1 run through registered
    // catalog tables (run_hive_analysis_simple.py:278-331) lands on the
    // same rows as the DataFrame-API pipeline
    assert(counts("top_temperate_cities_hql") === 2)
    def rows(t: String) = spark.read.parquet(s"$dir/out/$t")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(rows("top_temperate_cities_hql") === rows("top_temperate_cities"))
  }
}
