package graft

import graft.operators.{Decontaminate, History, Indexing, Retrieval, Sampling}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the wave-3 curation operators: BM25 retrieval, SCD2 history,
  * cross-split novelty, temperature mixing, Zipf fit.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- BM25 -------------------------------------------------------------

  lazy val corpus = Seq(
    (0L, "spark shuffle partition exchange broadcast join"),
    (1L, "spark shuffle partition exchange broadcast join"), // twin of 0
    (2L, "recipe for sourdough bread flour water salt"),
    (3L, "spark catalyst optimizer rule pushdown"),
    (4L, "completely unrelated poem about the sea and the moon"),
  ).toDF("doc_id", "text")

  test("bm25: a verbatim twin of the query doc ranks first; self excluded") {
    val top = Retrieval.bm25TopK(corpus, corpus.filter(col("doc_id") === 0),
      "doc_id", "text", k = 3).collect()
    assert(top.forall(_.getAs[Long]("query_id") == 0L))
    assert(top.forall(_.getAs[Long]("doc_id") != 0L), "self-match must be excluded")
    val first = top.find(_.getAs[Int]("rank") == 1).get
    assert(first.getAs[Long]("doc_id") === 1L)
    // sharing zero terms means no candidate row at all
    assert(!top.exists(_.getAs[Long]("doc_id") == 4L))
    // scores strictly decrease (ties broken by id, rounded scores non-increasing)
    val scores = top.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0.0), "Lucene-variant idf keeps scores positive")
  }

  // ---- SCD2 -------------------------------------------------------------

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  lazy val changeLog = Seq(
    // user 1: A A B A  -> versions A(2 events), B, A
    (1L, 1L, ts(1), "A"), (1L, 2L, ts(2), "A"),
    (1L, 3L, ts(3), "B"), (1L, 4L, ts(4), "A"),
    // user 2: constant -> one open version
    (2L, 5L, ts(1), "X"), (2L, 6L, ts(9), "X"),
  ).toDF("user_id", "event_id", "ts", "attr")

  test("scd2: runs collapse, versions contiguous, intervals chain, one current row") {
    val out = History.scd2(changeLog, "user_id", "attr", "ts", "event_id")
      .orderBy("user_id", "version").collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(_.getAs[Long]("version")).toSeq === Seq(1L, 2L, 3L))
    assert(u1.map(_.getAs[String]("attr")).toSeq === Seq("A", "B", "A"))
    assert(u1.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L, 1L))
    // interval chaining: valid_to(v) == valid_from(v+1); only last is open
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Timestamp]("valid_to") === b.getAs[Timestamp]("valid_from"))
    }
    assert(out.count(_.getAs[Boolean]("is_current")) === 2)
    assert(out.filter(_.getAs[Boolean]("is_current"))
      .forall(_.getAs[Timestamp]("valid_to") == null))
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length === 1 && u2.head.getAs[Long]("n_events") === 2L)
  }

  // ---- cross-split novelty ----------------------------------------------

  test("novelty: covered doc scores 0, disjoint doc scores 1, partial in between") {
    val seen = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val target = Seq(
      (10L, "alpha beta gamma delta"),            // all 3-grams seen
      (11L, "totally novel words only here now"), // none seen
      (12L, "alpha beta gamma unseen tail words"), // partial
    ).toDF("doc_id", "text")
    val nov = Decontaminate.crossSplitNovelty(target, seen, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    assert(nov(10L) === 0.0)
    assert(nov(11L) === 1.0)
    assert(nov(12L) > 0.0 && nov(12L) < 1.0)
  }

  // ---- temperature mixing -----------------------------------------------

  lazy val weighted = Seq(
    ("big", 90000L), ("small", 10000L)
  ).toDF("source", "w")

  test("temperature weights: alpha=1 is the natural mix; alpha<1 upweights scarce") {
    val natural = Sampling.temperatureWeights(weighted, "source", col("w"),
      alpha = 1.0, budgetTokens = 100000L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("natural_frac"), r.getAs[Double]("mix_frac"))).toMap
    natural.values.foreach { case (nat, mix) => assert(math.abs(nat - mix) < 1e-9) }

    val cooled = Sampling.temperatureWeights(weighted, "source", col("w"),
      alpha = 0.5, budgetTokens = 100000L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("natural_frac"), r.getAs[Double]("mix_frac"),
          r.getAs[Double]("epochs_at_budget"))).toMap
    assert(cooled("small")._2 > cooled("small")._1, "scarce source upweighted")
    assert(cooled("big")._2 < cooled("big")._1, "dominant source downweighted")
    // weights sum to 1 either way
    assert(math.abs(cooled.values.map(_._2).sum - 1.0) < 1e-6)
    // at alpha=0.5 the small source repeats more often per budget token
    assert(cooled("small")._3 > cooled("big")._3)
  }

  // ---- Zipf fit -----------------------------------------------------------

  test("zipfFit recovers the exponent of a planted power law") {
    // counts c(r) = round(1000 / r): slope of ln c vs ln r ≈ -1
    val words = (1 to 50).flatMap { r =>
      Seq.fill(math.max(1, math.round(1000.0 / r).toInt))(s"w$r")
    }
    val df = Seq(("s0", words.mkString(" "))).toDF("source", "text")
    val fit = Indexing.zipfFit(df, "source", "text", topN = 50).collect().head
    assert(fit.getAs[Long]("n_top") === 50L)
    assert(math.abs(fit.getAs[Double]("zipf_slope") - (-1.0)) < 0.05)
    assert(fit.getAs[Double]("zipf_r2") > 0.99)
  }
}
