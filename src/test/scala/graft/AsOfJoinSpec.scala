package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  // user 1: quotes at t=10, 20, 30; user 2: quote at t=100
  lazy val quotes = Seq(
    (1L, ts(10), 10.0), (1L, ts(20), 20.0), (1L, ts(30), 30.0),
    (2L, ts(100), 99.0),
  ).toDF("user_id", "qts", "price")
    .selectExpr("user_id", "qts", "qts as quote_ts", "price as quote_price")

  lazy val trades = Seq(
    (100L, 1L, ts(5)),   // before any quote -> null
    (101L, 1L, ts(20)),  // exactly at a quote -> matches t=20 (>= semantics)
    (102L, 1L, ts(25)),  // between -> t=20
    (103L, 1L, ts(99)),  // after all -> t=30
    (104L, 2L, ts(200)), // other user -> t=100
    (105L, 3L, ts(50)),  // user with no quotes -> null
  ).toDF("trade_id", "user_id", "ts")

  test("as-of join picks the latest right row at-or-before each left ts") {
    val got = AsOfJoin.joinAsOf(trades, quotes, Seq("user_id"), "ts", "qts",
        Seq("quote_ts", "quote_price"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Timestamp]("quote_ts")).map(_.getTime / 1000))
      .toMap
    assert(got === Map(
      100L -> None, 101L -> Some(20L), 102L -> Some(20L),
      103L -> Some(30L), 104L -> Some(100L), 105L -> None))
  }

  test("all left rows survive (left-join semantics) with values carried") {
    val out = AsOfJoin.joinAsOf(trades, quotes, Seq("user_id"), "ts", "qts",
      Seq("quote_ts", "quote_price"))
    assert(out.count() === trades.count())
    val p102 = out.filter($"trade_id" === 102L).head()
    assert(p102.getAs[Double]("quote_price") === 20.0)
  }
}
