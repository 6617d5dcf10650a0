package graft

import graft.operators.CrawlDiff
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the snapshot diff: the four statuses partition the URL
  * universe, every status matches the fixture formula, the summary's
  * counts sum to the detail frame, and diffing a snapshot against itself
  * is all-unchanged.
  */
class CrawlDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions.col

  private def docs(n: Int) = {
    import spark.implicits._
    spark.range(0, n).select(col("id").as("doc_id"),
      concat_str(col("id")).as("text"))
  }

  private def concat_str(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.concat(
      org.apache.spark.sql.functions.lit("body "), c)

  test("statuses partition the universe and match the formula") {
    import spark.implicits._
    val (prev, cur) = CrawlDiff.syntheticSnapshots(spark, docs(60))
    val out = CrawlDiff.diff(prev, cur, "url", "content_hash")
      .select("url", "status").as[(String, String)].collect().toMap
    assert(out.size === 60) // every doc appears in at least one snapshot
    (0 until 60).foreach { id =>
      val url = s"https://h${id % 13}.example.com/d/$id"
      val want =
        if (id % 5 == 0) "added"
        else if (id % 5 == 1) "removed"
        else if (id % 3 == 0) "changed"
        else "unchanged"
      assert(out(url) === want, s"id=$id")
    }
  }

  test("summary counts sum to the detail frame, keyed by host") {
    import spark.implicits._
    val (prev, cur) = CrawlDiff.syntheticSnapshots(spark, docs(60))
    val d = CrawlDiff.diff(prev, cur, "url", "content_hash")
    val summary = CrawlDiff.diffSummary(d)
      .as[(String, String, Long)].collect()
    assert(summary.map(_._3).sum === 60)
    assert(summary.map(_._1).forall(_.endsWith(".example.com")))
  }

  test("self-diff is all-unchanged") {
    import spark.implicits._
    val (prev, _) = CrawlDiff.syntheticSnapshots(spark, docs(40))
    val st = CrawlDiff.diff(prev, prev, "url", "content_hash")
      .select("status").as[String].collect()
    assert(st.nonEmpty && st.forall(_ == "unchanged"))
  }
}
