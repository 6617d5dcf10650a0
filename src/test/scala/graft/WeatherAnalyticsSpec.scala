package graft

import graft.analytics.WeatherAnalytics
import graft.io.CsvIngest
import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the six reference pipelines on a hand-checkable fixture
  * that hits every SURVEY §7.4 trap: unit-suffixed headers, non-padded
  * M/d/yyyy dates, a malformed numeric row (DROPMALFORMED), a malformed
  * date, a null et0, the Jan–Mar Maha shift, and an ISO-week-1 December.
  */
class WeatherAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val weatherSchema = StructType(Seq(
    StructField("location_id", IntegerType),
    StructField("date", StringType),
    StructField("temperature_2m_max", DoubleType),
    StructField("temperature_2m_mean", DoubleType),
    StructField("precipitation_hours", DoubleType),
    StructField("shortwave_radiation_sum", DoubleType),
    StructField("et0_fao_evapotranspiration", DoubleType)))

  val locationSchema = StructType(Seq(
    StructField("location_id", IntegerType),
    StructField("city_name", StringType)))

  lazy val (weather, locations) = {
    val dir = Files.createTempDirectory("graft_weather").toString
    val wPath = s"$dir/weather.csv"
    Files.writeString(java.nio.file.Path.of(wPath),
      """location_id,date,temperature_2m_max (°C),temperature_2m_mean (°C),precipitation_hours (h),shortwave_radiation_sum (MJ/m²),et0_fao_evapotranspiration (mm)
        |1,1/5/2010,30.0,27.0,6.5,18.0,4.0
        |1,1/20/2010,32.0,28.0,18.0,12.0,5.0
        |1,4/10/2010,33.0,29.0,2.0,20.0,6.0
        |2,4/11/2010,22.5,20.0,1.0,16.0,3.0
        |1,12/29/2014,29.0,26.0,100.0,10.0,2.0
        |2,12/30/2014,21.0,19.0,50.0,9.0,
        |2,notadate,20.0,18.0,3.0,8.0,1.0
        |xx,1/6/2010,30.0,27.0,1.0,1.0,1.0
        |""".stripMargin)
    val lPath = s"$dir/locations.csv"
    Files.writeString(java.nio.file.Path.of(lPath),
      """location_id,city_name
        |1,Colombo
        |2,Kandy
        |""".stripMargin)
    val raw = CsvIngest.readCsv(spark, wPath, weatherSchema)
    assert(raw.count() === 7, "DROPMALFORMED drops the non-numeric row")
    val w = WeatherAnalytics.prepare(raw).cache()
    val l = CsvIngest.readCsv(spark, lPath, locationSchema)
    (w, l)
  }

  test("ingest: DISK_ONLY storage option for beyond-memory inputs") {
    import org.apache.spark.storage.StorageLevel
    val dir = Files.createTempDirectory("graft_weather_disk").toString
    val p = s"$dir/w.csv"
    Files.writeString(java.nio.file.Path.of(p),
      "location_id,city_name\n1,Colombo\nbad_id,Kandy\n2,Galle\n")
    val (df, release) = CsvIngest.readCsvManaged(spark, p, locationSchema,
      corruptFilterStorage = StorageLevel.DISK_ONLY)
    assert(df.count() === 2, "malformed row dropped under DISK_ONLY too")
    // the materialization actually uses the requested level
    def levels = spark.sparkContext.getPersistentRDDs.values
      .map(_.getStorageLevel).toSeq
    assert(levels.exists(_ == StorageLevel.DISK_ONLY), levels.toString)
    // the handle releases the INTERNAL persisted frame (the returned
    // frame's plan differs, so df.unpersist() could not)
    release()
    assert(!levels.exists(_ == StorageLevel.DISK_ONLY), levels.toString)
  }

  test("ingest: header normalization + unit metadata + date typing") {
    assert(weather.columns.contains("temperature_2m_max"))
    val f = weather.schema.find(_.name == "temperature_2m_max").get
    assert(f.metadata.getString("unit") === "°C")
    assert(weather.count() === 6, "malformed date dropped at prepare")
    assert(weather.schema("date").dataType === DateType)
  }

  test("districtMonthly: MR job 1 golden values") {
    val got = WeatherAnalytics.districtMonthly(weather, locations)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.size === 5)
    assert(got(("Colombo", "2010-01")) === ((24.5, 27.5)))
    assert(got(("Colombo", "2014-12")) === ((100.0, 26.0)))
    assert(got(("Kandy", "2014-12")) === ((50.0, 19.0)))
  }

  test("highestPrecipitationMonth: global argmax") {
    val r = WeatherAnalytics.highestPrecipitationMonth(weather).head()
    assert(r.getString(0) === "2014-12")
    assert(r.getDouble(1) === 150.0)
  }

  test("topTemperateCities: deviation from 22°C, not minimum") {
    val got = WeatherAnalytics.topTemperateCities(weather, locations)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // Kandy avg 21.75 (dev 0.25) beats Colombo avg 31.0 (dev 9.0) even
    // though Colombo is hotter — "temperate" = closest, not lowest
    assert(got.map(_._1).toSeq === Seq("Kandy", "Colombo"))
    assert(got.head._2 === 21.75)
  }

  test("seasonalEvapotranspiration: Maha year shift + null/regex filters") {
    val got = WeatherAnalytics.seasonalEvapotranspiration(weather, locations)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getDouble(3))
      .toMap
    assert(got.size === 4)
    // January 2010 belongs to Maha season-year 2009
    assert(got(("Colombo", "Maha", 2009)) === 4.5)
    assert(got(("Colombo", "Yala", 2010)) === 6.0)
    assert(got(("Colombo", "Maha", 2014)) === 2.0)
    // Kandy Dec 2014 had null et0 -> no Maha 2014 row for Kandy
    assert(!got.contains(("Kandy", "Maha", 2014)))
  }

  test("radiationAnalysis: conditional percentage") {
    val jan = WeatherAnalytics.radiationAnalysis(weather)
      .filter("year = 2010 AND month = 1").head()
    assert(jan.getAs[Long]("total_days") === 2)
    assert(jan.getAs[Long]("days_above_threshold") === 1)
    assert(jan.getAs[Double]("avg_radiation") === 15.0)
    assert(jan.getAs[Double]("pct_above") === 50.0)
  }

  test("weeklyMaxTempHottestMonths: ISO week 1 appears under December") {
    val dec2014 = WeatherAnalytics.weeklyMaxTempHottestMonths(weather, locations)
      .filter("year = 2014 AND month = 12").collect()
    assert(dec2014.nonEmpty)
    // 12/29/2014 and 12/30/2014 are ISO week 1 of 2015 — keyed (2014, 12, 1)
    assert(dec2014.forall(_.getAs[Int]("week") === 1))
  }
}
