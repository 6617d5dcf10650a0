package graft

import graft.operators.{Bucketing, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew + bucketing: correctness of the salted two-stage shapes, and
  * shuffle-freedom of bucketed co-located joins.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg == plain groupBy aggregation") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("sum_l_quantity"), count($"l_orderkey").as("count_l_orderkey"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(li, Seq($"l_returnflag"), salts = 8,
      Seq("l_quantity" -> "sum", "l_orderkey" -> "count"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === plain.keySet)
    for ((k, (s, c)) <- plain) {
      assert(math.abs(salted(k)._1 - s) < 1e-6, s"sum mismatch for $k")
      assert(salted(k)._2 === c, s"count mismatch for $k")
    }
  }

  test("saltedJoin == plain join on skewed fact") {
    val fact = Tables.orders(spark, TestSpark.sf0001).select($"o_custkey", $"o_totalprice")
    val dim = Tables.customer(spark, TestSpark.sf0001).select($"c_custkey".as("o_custkey"), $"c_name")
    val hot = fact.groupBy($"o_custkey").count().orderBy($"count".desc)
      .limit(3).collect().map(_.getLong(0)).toSeq
    val plain = fact.join(dim, "o_custkey").count()
    val salted = Skew.saltedJoin(fact, dim, "o_custkey", hot, salts = 4).count()
    assert(salted === plain)
  }

  test("bucketed join runs with zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Bucketing.writeBucketed(
      Tables.orders(spark, TestSpark.sf0001).select($"o_orderkey", $"o_totalprice"),
      "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, TestSpark.sf0001)
        .select($"l_orderkey".as("o_orderkey"), $"l_quantity"),
      "b_lineitem", "o_orderkey", 4)
    val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    joined.write.format("noop").mode("overwrite").save()
    assert(Bucketing.countShuffles(joined) === 0, "bucketed join must not shuffle")
    // and it is correct
    val expect = Tables.lineitem(spark, TestSpark.sf0001).count()
    assert(joined.count() === expect)
  }
}
