package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run at sf0.001 (the driver's smoke scale) and
  * agree with `oracleSql` on column-name expectations implicitly via the
  * DuckDB gate; here we assert execution + known cardinalities/spot values.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // anti-join/except can legitimately be empty; everything else must emit rows
  private val mayBeEmpty = Set("q10_anti_join", "q24_except")

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql without query: $unknown")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("q14_argmax_month returns exactly one row") {
    assert(SparkEntry.queries("q14_argmax_month")(spark, TestSpark.sf0001).count() === 1)
  }

  test("q12_cross_join = |region| x |nation|") {
    assert(SparkEntry.queries("q12_cross_join")(spark, TestSpark.sf0001).count() === 125)
  }

  test("q40_dedup_exact covers every document") {
    val df = SparkEntry.queries("q40_dedup_exact")(spark, TestSpark.sf0001)
    val total = df.agg(org.apache.spark.sql.functions.sum("dup_count")).head().getLong(0)
    assert(total === Tables.documents(spark, TestSpark.sf0001).count())
  }
}
