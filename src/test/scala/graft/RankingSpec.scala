package graft

import graft.operators.Ranking
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val df = Seq(
    ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 20.0), ("a", 4, 5.0),
    ("b", 5, 7.0), ("b", 6, 7.0),
  ).toDF("grp", "id", "v")

  test("topKPerGroup: deterministic ties via explicit tie-break column") {
    val top = Ranking.topKPerGroup(df, Seq($"grp"), Seq($"v".desc, $"id"), 2)
      .select($"grp", $"rank", $"id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(top === Set(("a", 1, 2), ("a", 2, 3), ("b", 1, 5), ("b", 2, 6)))
  }

  test("argmax returns single row, smallest key wins ties") {
    val r = Ranking.argmax(df, $"grp", sum($"v"), "k", "total").collect()
    assert(r.length === 1)
    assert(r.head.getString(0) === "a" && r.head.getDouble(1) === 55.0)

    val tied = Seq(("x", 1.0), ("y", 1.0)).toDF("g", "v")
    assert(Ranking.argmax(tied, $"g", sum($"v"), "k", "t").head().getString(0) === "x")
  }

  test("topKSemiJoin filters fact to top-k group keys") {
    val fact = df
    val filtered = Ranking.topKSemiJoin(fact, df.groupBy($"grp").agg(sum($"v").as("t")),
      Seq("grp"), Seq($"t".desc, $"grp"), 1)
    assert(filtered.select($"grp").distinct().collect().map(_.getString(0)).toSeq === Seq("a"))
  }
}
