package graft

import graft.expressions.TokenExpressions
import graft.functions.ColumnFunctions._
import graft.operators.Ranking
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2 item 4): sum preservation
  * across grouping grains, percentage bounds, argmax membership, top-k
  * cardinality, Jaccard metric laws.
  */
class PropertySpec extends AnyFunSuite {

  /** Seeded, dependency-light forAll: 10 deterministic samples per law
    * (no scalatestplus bridge in the offline cache).
    */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 10).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    (1 to 10).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } body(a, b)
    }
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowGen = for {
    key <- Gen.choose(1, 4)
    sub <- Gen.choose(1, 3)
    v <- Gen.choose(0, 1000) // integer-valued doubles: exact sums
  } yield (key, sub, v.toDouble)

  private val dataGen = Gen.nonEmptyListOf(rowGen)

  test("sum is preserved across grouping grains (monthly Σ == total)") {
    forAll(dataGen) { rows =>
      val df = rows.toDF("k", "sub", "v")
      val fine = df.groupBy($"k", $"sub").agg(sum($"v").as("s"))
      val coarseFromFine = fine.groupBy($"k").agg(sum($"s")).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val direct = df.groupBy($"k").agg(sum($"v")).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(coarseFromFine === direct)
    }
  }

  test("pctIf stays within [0, 100]") {
    forAll(dataGen) { rows =>
      val pcts = rows.toDF("k", "sub", "v")
        .groupBy($"k").agg(pctIf($"v" > 500).as("p"))
        .collect().map(_.getDouble(1))
      assert(pcts.forall(p => p >= 0.0 && p <= 100.0))
    }
  }

  test("argmax result is a real group with the true maximum value") {
    forAll(dataGen) { rows =>
      val df = rows.toDF("k", "sub", "v")
      val r = Ranking.argmax(df, $"k".cast("string"), sum($"v"), "key", "total").head()
      val totals = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      assert(totals(r.getString(0).toInt) === r.getDouble(1))
      assert(r.getDouble(1) === totals.values.max)
    }
  }

  test("topKPerGroup emits at most k rows per group, ranked contiguously") {
    forAll(dataGen, Gen.choose(1, 3)) { (rows, k) =>
      val df = rows.toDF("k", "sub", "v")
      val top = Ranking.topKPerGroup(df, Seq($"k"), Seq($"v".desc, $"sub"), k)
      val byGroup = top.groupBy($"k").count().collect().map(_.getLong(1))
      assert(byGroup.forall(_ <= k))
      val ranks = top.select($"k", $"rank").collect()
        .groupBy(_.getInt(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq)
      assert(ranks.values.forall(rs => rs == (1 to rs.length)))
    }
  }

  private val tokensGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))

  test("jaccard: identity, symmetry, bounds") {
    forAll(tokensGen, tokensGen) { (ta, tb) =>
      val df = Seq((ta, tb)).toDF("a", "b")
      val r = df.select(
        TokenExpressions.jaccardSim($"a", $"b").as("ab"),
        TokenExpressions.jaccardSim($"b", $"a").as("ba"),
        TokenExpressions.jaccardSim($"a", $"a").as("aa")).head()
      assert(r.getDouble(0) === r.getDouble(1)) // symmetric
      assert(r.getDouble(2) === 1.0)            // identity
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
    }
  }

  test("jaccard expression equals size(intersect)/size(union) on distinct arrays") {
    forAll(tokensGen, tokensGen) { (ta, tb) =>
      val df = Seq((ta.distinct, tb.distinct)).toDF("a", "b")
      val r = df.select(
        TokenExpressions.jaccardSim($"a", $"b").as("fast"),
        when(size(array_union($"a", $"b")) === 0, 0.0)
          .otherwise(size(array_intersect($"a", $"b")).cast("double") /
            size(array_union($"a", $"b"))).as("ref")).head()
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("interleaveBits is monotone per coordinate and bounded") {
    val coordGen = Gen.choose(0, 255)
    forAll(coordGen, coordGen) { (x, y) =>
      val df = Seq((x, y, (x + 1) % 256, (y + 1) % 256)).toDF("x", "y", "x2", "y2")
      val r = df.select(
        graft.io.Layout.interleaveBits(Seq($"x", $"y"), 8).as("z"),
        graft.io.Layout.interleaveBits(Seq($"x2", $"y"), 8).as("zx"),
        graft.io.Layout.interleaveBits(Seq($"x", $"y2"), 8).as("zy")).head()
      val (z, zx, zy) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z >= 0 && z < (1L << 16))
      if (x < 255) assert(zx > z) // larger x, same y → larger z
      if (y < 255) assert(zy > z)
    }
  }

  test("mixingRates: rates in [0,1], no stratum upsampled, scarcest source fully kept") {
    val df = Seq.tabulate(100)(i => (s"s${i % 4}", i)).toDF("src", "id")
    val rates = graft.operators.Sampling
      .mixingRates(df, "src", Map("s0" -> 0.5, "s1" -> 0.25, "s2" -> 0.25))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    // 25 rows per stratum; capacity = min(25/0.5, 25/0.25) = 50
    assert(rates("s0") === ((25L, 0.5, 25L, 1.0)))   // scarcest: fully kept
    assert(rates("s1")._3 === 13L)                    // 0.25*50 = 12.5 → 13
    assert(rates("s3")._4 === 0.0)                    // untargeted source
    assert(rates.values.forall { case (_, _, _, r) => r >= 0.0 && r <= 1.0 })
  }

  test("season/seasonYear partition the calendar with no gaps") {
    val all = (2019 to 2021).flatMap(y => (1 to 12).map(m => (y, m)))
    val got = all.toDF("y", "m")
      .select($"y", $"m", season($"m").as("s"), seasonYear($"y", $"m").as("sy"))
      .collect()
    assert(got.length === 36)
    // every row classified; season years only ever y or y-1
    assert(got.forall(r => Set("Maha", "Yala")(r.getString(2))))
    assert(got.forall(r => r.getInt(3) == r.getInt(0) || r.getInt(3) == r.getInt(0) - 1))
  }
}
