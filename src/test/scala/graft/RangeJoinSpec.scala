package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed range join == naive inequality join") {
    val points = Tables.orders(spark, TestSpark.sf0001)
      .select($"o_orderkey", $"o_totalprice")
    val bands = Seq(("a", 0.0, 100000.0), ("b", 100000.0, 250000.0), ("c", 250000.0, 1e9))
      .toDF("band", "lo", "hi")
    val naive = points.join(bands,
        $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .select($"o_orderkey", $"band")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bucketed = RangeJoin.byBucket(points, "o_totalprice", bands, "lo", "hi", 75000.0)
      .select($"o_orderkey", $"band")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bucketed === naive)
  }

  test("edge values: point on lo included, on hi excluded; edge-aligned hi") {
    val points = Seq((1L, 10.0), (2L, 20.0), (3L, 19.999999)).toDF("id", "v")
    val bands = Seq(("x", 10.0, 20.0)).toDF("band", "lo", "hi")
    val got = RangeJoin.byBucket(points, "v", bands, "lo", "hi", 10.0)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
  }
}
