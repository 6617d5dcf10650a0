package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-sketch tolerances (q37): HLL cardinality within its
  * documented error bound, approx percentiles within rank tolerance.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct within 5% of exact") {
    // the entry itself emits the tolerance verdicts the oracle replays;
    // re-derive the raw estimate here so the numeric margin stays visible
    val approx = Tables.lineitem(spark, TestSpark.sf0001)
      .agg(approx_count_distinct($"l_partkey")).head().getLong(0).toDouble
    val r = SparkEntry.queries("q37_approx_sketches")(spark, TestSpark.sf0001).head()
    val exact = r.getAs[Long]("exact_parts").toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
    assert(r.getAs[Boolean]("approx_distinct_ok"))
    assert(r.getAs[Boolean]("p50_ok"))
    assert(r.getAs[Boolean]("p99_ok"))
  }

  test("approx percentiles bracket the exact quantiles") {
    val prices = Tables.lineitem(spark, TestSpark.sf0001)
      .select($"l_extendedprice").collect().map(_.getDouble(0)).sorted
    val r = SparkEntry.queries("q37_approx_sketches")(spark, TestSpark.sf0001).head()
    val p50 = r.getAs[Double]("p50_price")
    val p99 = r.getAs[Double]("p99_price")
    def rankOf(v: Double) = prices.count(_ <= v).toDouble / prices.length
    assert(math.abs(rankOf(p50) - 0.5) < 0.02)
    assert(math.abs(rankOf(p99) - 0.99) < 0.02)
    assert(p50 < p99)
  }

  test("dedupCorpus removes exact and fuzzy dups, keeps unrelated docs") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy cat again and again today"),
      (3L, "completely different content about spark catalyst optimizer rules"),
    ).toDF("doc_id", "text")
    val cleaned = graft.operators.Dedup.dedupCorpus(corpus, "doc_id", "text", threshold = 0.5)
    assert(cleaned.select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 3L))
  }
}
