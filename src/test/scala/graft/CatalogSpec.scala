package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The SQL/catalog surface (SURVEY §2.1 Hive-external-table scan + §3.3
  * lifecycle): external CSV tables declared in the catalog, TSV sink
  * round-trip, and a full reference query run through spark.sql over
  * registered views.
  */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("external CSV catalog table (Hive external-table analog)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_cat").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/loc.csv"),
      "location_id,city_name\n1,Colombo\n2,Kandy\n")
    graft.io.Catalog.createExternalCsv(spark, "ext_locations", s"$dir/loc.csv",
      StructType(Seq(StructField("location_id", IntegerType),
        StructField("city_name", StringType))))
    val got = spark.sql(
      "SELECT city_name FROM ext_locations WHERE location_id = 2")
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("Kandy"))
    // EXTERNAL semantics: dropping the table must leave the data intact
    spark.sql("DROP TABLE ext_locations")
    assert(Files.exists(java.nio.file.Path.of(s"$dir/loc.csv")))
  }

  test("external parquet tables + view through the Catalog helper") {
    graft.io.Catalog.registerParquetTables(spark, Map(
      "cat_nation" -> s"${TestSpark.sf0001}/nation.parquet",
      "cat_region" -> s"${TestSpark.sf0001}/region.parquet"))
    graft.io.Catalog.createView(spark, "cat_nations_per_region", """
      SELECT r_name, count(*) AS n_nations
      FROM cat_nation JOIN cat_region ON n_regionkey = r_regionkey
      GROUP BY r_name""")
    val n = spark.sql("SELECT sum(n_nations) FROM cat_nations_per_region")
      .head().getLong(0)
    assert(n === 25L)
    spark.sql("DROP VIEW cat_nations_per_region")
    spark.sql("DROP TABLE cat_nation"); spark.sql("DROP TABLE cat_region")
  }

  test("useDatabase: tables land in the named database (01_create_tables.hql:7-8)") {
    graft.io.Catalog.useDatabase(spark, "graft_db_test")
    try {
      graft.io.Catalog.createExternalParquet(spark, "db_nation",
        s"${TestSpark.sf0001}/nation.parquet")
      assert(spark.sql("SELECT count(*) FROM graft_db_test.db_nation")
        .head().getLong(0) === 25L)
      assert(spark.catalog.tableExists("graft_db_test.db_nation"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_db_test.db_nation")
      spark.sql("USE default")
      spark.sql("DROP DATABASE IF EXISTS graft_db_test")
    }
  }

  test("paths containing an apostrophe survive DDL interpolation") {
    // Spark's lexer treats '' as literal-end + adjacent literal (implicit
    // concat drops the quote) — only backslash escaping round-trips
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_apos").toString + "/o'brien"
    Seq((1, "x"), (2, "y")).toDF("k", "v").write.parquet(dir)
    graft.io.Catalog.createExternalParquet(spark, "apos_table", dir)
    try assert(spark.sql("SELECT count(*) FROM apos_table").head().getLong(0) === 2L)
    finally spark.sql("DROP TABLE apos_table")
  }

  test("TSV sink round-trip (TabSeparated bulk-insert analog)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tsv").toString + "/out"
    val df = Seq((1, "a\tb escaped?"), (2, "plain")).toDF("k", "v")
    df.write.option("sep", "\t").option("header", "true").csv(dir)
    val back = spark.read.option("sep", "\t").option("header", "true")
      .schema(df.schema).csv(dir)
    assert(back.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2))
  }

  test("reference query through spark.sql over registered views (§3.3)") {
    Tables.registerAll(spark, TestSpark.sf0001)
    // Hive q2 analog as literal SQL — season CASE + season-year shift
    val sql = spark.sql("""
      SELECT n_name,
             CASE WHEN month(o_orderdate) IN (1,2,3,9,10,11,12)
                  THEN 'Maha' ELSE 'Yala' END AS season,
             CASE WHEN month(o_orderdate) IN (1,2,3)
                  THEN year(o_orderdate) - 1 ELSE year(o_orderdate) END AS season_year,
             round(avg(o_totalprice) + 1e-8, 2) AS avg_total,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, season, season_year""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        (r.getDouble(3), r.getLong(4))).toMap
    val df = SparkEntry.queries("q16_seasonal_shift")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        (r.getDouble(3), r.getLong(4))).toMap
    assert(sql === df)
  }
}
