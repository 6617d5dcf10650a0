package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-2 coverage queries (ExtendedQueries) beyond the
  * DuckDB hash gate: structural properties that hold on any corpus.
  */
class ExtendedQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("q69 full outer: every nation key of either side survives, counts non-negative") {
    val out = q("q69_full_outer").cache()
    val nk = Tables.customer(spark, TestSpark.sf0001).select(col("c_nationkey")).distinct().count()
    assert(out.count() >= nk)
    assert(out.filter(col("n_cust") < 0 || col("n_supp") < 0).count() === 0)
    out.unpersist()
  }

  test("q70 pivot: F+O+P per year equals total orders per year") {
    val out = q("q70_pivot")
    val pivotTotal = out.agg(sum(col("F") + col("O") + col("P"))).head().getLong(0)
    assert(pivotTotal === Tables.orders(spark, TestSpark.sf0001).count())
  }

  test("q71 percentiles are ordered p25 <= p50 <= p75 <= p95") {
    val bad = q("q71_percentiles")
      .filter(col("p25") > col("p50") || col("p50") > col("p75") || col("p75") > col("p95"))
    assert(bad.count() === 0)
  }

  test("q75 grouping sets: grand total row equals table count") {
    val grand = q("q75_grouping_sets")
      .filter(col("g_flag") === 1 && col("g_status") === 1)
    assert(grand.count() === 1)
    assert(grand.head().getAs[Long]("n") ===
      Tables.lineitem(spark, TestSpark.sf0001).count())
  }

  test("q76 gap fill: per-type day count equals span length, sum preserved") {
    val out = q("q76_gap_fill").cache()
    // dense axis: n_days = maxd - mind + 1 for each type
    val spans = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_type"), to_date(col("ts")).as("dt"))
      .groupBy("event_type")
      .agg((datediff(max(col("dt")), min(col("dt"))) + 1).as("span"))
    val got = out.groupBy("event_type").agg(count(lit(1)).as("days"))
    val mismatch = got.join(spans, "event_type")
      .filter(col("days") =!= col("span")).count()
    assert(mismatch === 0)
    val total = out.agg(sum("n_events")).head().getLong(0)
    assert(total === Tables.events(spark, TestSpark.sf0001).count())
    out.unpersist()
  }

  test("q77 sliding window: trailing avg equals daily total on the first day") {
    val first = q("q77_sliding_window").orderBy(col("day")).limit(1).head()
    assert(math.abs(first.getAs[Double]("total") - first.getAs[Double]("trailing_avg_7d")) < 1e-6)
  }

  test("q80 unpivot: 2 rows per part") {
    assert(q("q80_unpivot").count() ===
      2 * Tables.part(spark, TestSpark.sf0001).count())
  }

  test("q81 bpe tokens >= whitespace tokens (splitting only refines)") {
    val joined = q("q81_bpe_tokens")
      .join(SparkEntry.queries("q41_token_count")(spark, TestSpark.sf0001), "doc_id")
    assert(joined.filter(col("n_bpe_tokens") < col("n_tokens")).count() === 0)
  }
}
