package graft

import graft.operators.{Frontier, Sitemap}
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the politeness scheduler: per-host slots are a dense 0-based
  * sequence, priority is non-increasing along each host's queue, the
  * offset is slot·delay, ties break deterministically by URL, and a
  * replay schedules identically.
  */
class FrontierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def scheduled() = {
    import org.apache.spark.sql.functions.col
    val docs = spark.range(0, 60).select(col("id").as("doc_id"),
      org.apache.spark.sql.functions.lit("t").as("text"))
    Frontier.schedule(
      Sitemap.parseBinary(spark, Sitemap.syntheticSitemapCorpus(spark, docs)),
      "loc", "priority", delaySec = 5.0)
  }

  test("per-host slots are dense, priority-ordered, offset = slot·delay") {
    import spark.implicits._
    val rows = scheduled()
      .select("host", "slot", "priority", "offset_sec", "loc")
      .as[(String, Long, Double, Double, String)].collect()
    rows.groupBy(_._1).foreach { case (host, q) =>
      val byProto = q.sortBy(_._2)
      assert(byProto.map(_._2).toSeq === (0L until q.length).toSeq, host)
      // priority never increases along the queue; URL breaks ties upward
      byProto.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._5 < b._5), host)
        case _ => ()
      }
      byProto.foreach(r => assert(r._4 === r._2 * 5.0))
    }
  }

  test("replay schedules identically (deterministic tie-break)") {
    val a = scheduled().orderBy("host", "slot").collect().toSeq
    val b = scheduled().orderBy("host", "slot").collect().toSeq
    assert(a === b)
  }

  test("budget allocation: caps respect politeness, allocs sum to " +
      "min(budget, total cap), boundary splits exactly one host") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val f = scheduled().withColumn("delay_sec",
      (regexp_extract(col("host"), "^h(\\d+)\\.", 1).cast("long") % 5 + 1)
        .cast("double"))
    val out = Frontier.budgetAllocate(f, "host", "delay_sec",
        windowSec = 60.0, budget = 150L)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    out.foreach { case (host, qlen, cap, alloc) =>
      val delay = host.drop(1).takeWhile(_.isDigit).toLong % 5 + 1
      assert(cap === math.min(qlen, 60 / delay + 1), host)
      assert(alloc >= 0 && alloc <= cap, host)
    }
    val totalCap = out.map(_._3).sum
    assert(out.map(_._4).sum === math.min(150L, totalCap))
    // full caps up to the boundary, at most one partial, zeros after
    val partials = out.count(r => r._4 > 0 && r._4 < r._3)
    assert(partials <= 1)
  }

  test("budget allocation: the two-pass distributed prefix sum equals the " +
      "single-window reference, under any partition count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val f = scheduled().withColumn("delay_sec",
      (regexp_extract(col("host"), "^h(\\d+)\\.", 1).cast("long") % 5 + 1)
        .cast("double"))
    // reference: the naive global-order running sum, computed driver-side
    val per = f.groupBy("host")
      .agg(count(lit(1)).as("q"), first(col("delay_sec")).as("d"))
      .as[(String, Long, Double)].collect().sortBy(_._1)
    var run = 0L
    val want = per.map { case (h, q, d) =>
      val cap = math.min(q, (60.0 / d).toLong + 1)
      val alloc = math.max(0L, math.min(cap, 150L - run))
      run += cap
      (h, q, cap, alloc)
    }.toSeq
    for (parts <- Seq("1", "3", "32")) {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val got = Frontier.budgetAllocate(f, "host", "delay_sec",
            windowSec = 60.0, budget = 150L)
          .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
        assert(got === want, s"parts=$parts")
      } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
  }

  test("budget allocation: a null/zero delay falls back instead of " +
      "silently deleting the politeness cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val f = Seq(
      ("bad0.example.com", 0.0), ("badnull.example.com", Double.NaN),
      ("good.example.com", 2.0))
      .flatMap { case (h, d) => (0 until 100).map(i => (h, s"u$i", d)) }
      .toDF("host", "url", "delay_sec")
      .withColumn("delay_sec",
        when(isnan(col("delay_sec")), lit(null)).otherwise(col("delay_sec")))
    val out = Frontier.budgetAllocate(f, "host", "delay_sec",
        windowSec = 60.0, budget = 1000L, fallbackDelaySec = 1.0)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // fallback delay 1.0 → cap 61, NOT the unguarded queue_len 100
    assert(out("bad0.example.com") === ((100L, 61L, 61L)))
    assert(out("badnull.example.com") === ((100L, 61L, 61L)))
    assert(out("good.example.com") === ((100L, 31L, 31L)))
  }
}
