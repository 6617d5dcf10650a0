package graft

import graft.operators.Redirects
import org.scalatest.funsuite.AnyFunSuite

/** Laws for pointer-doubling redirect resolution: chain members all
  * land on the terminal with position-exact hop counts, a 20-hop chain
  * resolves within the ⌈log₂ 32⌉ rounds, cycles report terminal=false,
  * dangling targets finish at the external URL, and the fixture frame
  * matches the formula.
  */
class RedirectsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def resolve(rows: Seq[(String, String)]) = {
    import spark.implicits._
    val df = spark.createDataFrame(rows.map { case (u, l) =>
      (u, Option(l))
    }).toDF("url", "location")
    Redirects.resolve(df, "url", "location")
      .as[(String, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("a 20-hop chain resolves in the 5 doubling rounds") {
    val rows = (0 until 20).map(p => s"u$p" -> s"u${p + 1}") :+ ("u20" -> null)
    val out = resolve(rows)
    (0 to 20).foreach { p =>
      assert(out(s"u$p") === (("u20", 20L - p, true)), s"p=$p")
    }
  }

  test("cycles never terminate: terminal=false for every member") {
    val out = resolve(Seq("a" -> "b", "b" -> "c", "c" -> "a", "t" -> null))
    Seq("a", "b", "c").foreach(u => assert(!out(u)._3, u))
    assert(out("t") === (("t", 0L, true)))
  }

  test("dangling target (never fetched) ends the chain at the external URL") {
    val out = resolve(Seq("a" -> "b", "b" -> "https://elsewhere.org/x"))
    assert(out("a") === (("https://elsewhere.org/x", 2L, true)))
    assert(out("b") === (("https://elsewhere.org/x", 1L, true)))
  }

  test("fixture chains resolve to the formula terminal") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = spark.range(0, 40).select(col("id").as("doc_id"),
      org.apache.spark.sql.functions.lit("t").as("text"))
    val out = Redirects.resolve(
        Redirects.syntheticFetchLog(spark, docs), "url", "location")
      .as[(String, String, Long, Boolean)].collect()
    assert(out.length === (0L until 40L).map(id => 1 + (id % 4)).sum)
    assert(out.forall(_._4))
    val r = out.find(_._1 == "https://h7.example.com/r/7/0").get
    assert(r === (("https://h7.example.com/r/7/0",
      "https://h7.example.com/r/7/3", 3L, true)))
  }
}
