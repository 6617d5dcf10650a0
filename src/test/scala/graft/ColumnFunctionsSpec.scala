package graft

import graft.functions.ColumnFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic-parity traps from SURVEY.md §7.4: season boundaries, the
  * Jan–Mar season-year shift, year-month zero-padding, severity
  * thresholds, parity rounding.
  */
class ColumnFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("season: Sep–Mar is Maha, Apr–Aug is Yala") {
    val got = (1 to 12).toDF("m")
      .select($"m", season($"m").as("s"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(Seq(1, 2, 3, 9, 10, 11, 12).forall(got(_) == "Maha"))
    assert(Seq(4, 5, 6, 7, 8).forall(got(_) == "Yala"))
  }

  test("seasonYear: Jan–Mar attributed to previous year") {
    val got = Seq((2020, 1), (2020, 3), (2020, 4), (2020, 9), (2020, 12))
      .toDF("y", "m")
      .select(seasonYear($"y", $"m").as("sy"))
      .collect().map(_.getInt(0))
    assert(got.toSeq === Seq(2019, 2019, 2020, 2020, 2020))
  }

  test("yearMonth zero-pads the month") {
    val got = Seq("2020-01-05", "2020-11-30").toDF("d")
      .select(yearMonth(to_date($"d")).as("ym")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("2020-01", "2020-11"))
  }

  test("severity thresholds: Severe needs both scaled bounds") {
    val got = Seq(
      (46.0, 53000.0), // both scaled exceeded -> Severe
      (46.0, 41000.0), // only base -> Moderate
      (31.0, 41000.0), // base -> Moderate
      (31.0, 39000.0), // b under base -> Normal
      (29.0, 53000.0), // a under base -> Normal
    ).toDF("a", "b")
      .select(severity($"a", 30, $"b", 40000).as("s")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("Severe", "Moderate", "Moderate", "Normal", "Normal"))
  }

  test("pctIf is a percentage in [0,100]") {
    val got = Seq(1, 2, 3, 4).toDF("x")
      .agg(pctIf($"x" > 2).as("p")).head().getDouble(0)
    assert(got === 50.0)
  }

  test("pround resolves decimal midpoints upward deterministically") {
    // 36662.005 is the exact midpoint that Spark/DuckDB round differently;
    // the epsilon forces .01 on both engines
    val got = Seq(36662.005, 1.005, 2.675).toDF("x")
      .select(pround($"x", 2).as("r")).collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(36662.01, 1.01, 2.68))
  }
}
