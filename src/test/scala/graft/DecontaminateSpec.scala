package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // doc 10 copies the benchmark item verbatim; doc 11 embeds it inside
  // extra prose (partial overlap); doc 12 shares no 4-gram with it.
  lazy val bench = Seq(
    (100L, "what is the capital of france answer paris of course")
  ).toDF("doc_id", "text")
  lazy val corpus = Seq(
    (10L, "what is the capital of france answer paris of course"),
    (11L, "trivia dump follows what is the capital of france answer paris of course end of dump"),
    (12L, "an entirely unrelated training document about spark aggregation"),
  ).toDF("doc_id", "text")

  test("contaminationReport flags exact and partial overlap, skips clean docs") {
    val rep = Decontaminate.contaminationReport(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Double]("contaminated_frac"))).toMap
    assert(rep.keySet === Set(10L, 11L))
    // verbatim copy: every one of its distinct 4-grams is in the bench set
    assert(rep(10L)._2 === 1.0)
    // partial: some hits, strictly between 0 and 1
    assert(rep(11L)._1 > 0 && rep(11L)._2 > 0.0 && rep(11L)._2 < 1.0)
  }

  test("decontaminate drops any-overlap docs at maxFrac 0, keeps the clean one") {
    val kept = Decontaminate.decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(12L))
    // a lenient threshold keeps the partial-overlap doc
    val lenient = Decontaminate.decontaminate(corpus, bench, "doc_id", "text",
      n = 4, maxFrac = 0.9).select("doc_id").as[Long].collect().toSet
    assert(lenient === Set(11L, 12L))
  }

  test("crossSourceContainment: mirrored sources hit 1.0, disjoint pairs are absent") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten eleven"
    val docs = Seq(
      ("s1", a), ("s2", a),          // s2 mirrors s1 exactly
      ("s2", b),                      // ...plus extra content of its own
      ("s3", "totally disjoint words nothing shared with any other source here"),
    ).toDF("source", "text")
    val got = Decontaminate.crossSourceContainment(docs, "source", "text", n = 4)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Double]("containment")))).toMap
    // every 4-gram of s1 appears in s2 -> containment 1.0
    assert(got(("s1", "s2"))._2 === 1.0)
    // s2 has b's grams too, so only part of it is covered by s1
    assert(got(("s2", "s1"))._2 < 1.0 && got(("s2", "s1"))._1 === got(("s1", "s2"))._1)
    // s3 shares nothing: absent from the matrix entirely
    assert(!got.keySet.exists(p => p._1 == "s3" || p._2 == "s3"))
  }

  test("corpus side never shuffles before the hit count: bench is broadcast") {
    val rep = Decontaminate.contaminationReport(corpus, bench, "doc_id", "text", n = 4)
    val plan = rep.queryExecution.optimizedPlan.toString
    assert(plan.contains("ResolvedHint") || rep.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"), plan)
  }

  test("sizeBoundedBench: over-cap bench degrades to a shuffle join with identical results") {
    import spark.implicits._
    import graft.functions.TextFunctions.shingles
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(shingles(col("text"), 8))).as("g"))
    def bg = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(array_distinct(shingles(col("text"), 8))).as("g"))
      .distinct().withColumn("hit", lit(1L))
    def hits(bench: org.apache.spark.sql.DataFrame) =
      grams.join(bench, Seq("g"), "left_outer")
        .groupBy("doc_id")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .filter(col("n_hits") > 0)
    // disable Spark's size-based auto-broadcast so the ONLY possible
    // broadcast comes from the helper's explicit hint
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val small = hits(Decontaminate.sizeBoundedBench(bg))
      assert(small.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"), "under the cap the bench must broadcast")
      val large = hits(Decontaminate.sizeBoundedBench(bg, maxBroadcast = 1))
      assert(!large.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"), "over the cap the join must shuffle")
      assert(large.orderBy("doc_id").collect().toSeq ===
        small.orderBy("doc_id").collect().toSeq,
        "both paths must count the same hits")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
