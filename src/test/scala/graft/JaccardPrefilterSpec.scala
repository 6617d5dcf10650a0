package graft

import graft.expressions.TokenExpressions.jaccardSim
import graft.plans.JaccardPrefilter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-injected size-band prefilter for jaccard thresshold predicates:
  * fires only on provably-distinct inputs, never changes results, and is
  * idempotent alongside hand-written guards.
  */
class JaccardPrefilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withRule[A](body: => A): A = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ JaccardPrefilter
    try body finally spark.experimental.extraOptimizations = saved
  }

  // parquet-backed so ConvertToLocalRelation can't fold away the Project
  // that carries the array_distinct alias (the shape real scans have)
  private lazy val docsPath: String = {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_jacc").toString
    Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d x"),
      (4L, "z z z z z"), (5L, "z"), (6L, "p q")).toDF("id", "text")
      .write.mode("overwrite").parquet(p)
    p
  }

  private def pairs(distinct: Boolean): DataFrame = {
    val docs = spark.read.parquet(docsPath)
    val tokExpr = if (distinct) array_distinct(split(col("text"), " "))
                  else split(col("text"), " ")
    val t = docs.select(col("id"), tokExpr.as("tok"))
    val a = t.select(col("id").as("id_a"), col("tok").as("tok_a"))
    val b = t.select(col("id").as("id_b"), col("tok").as("tok_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(jaccardSim(col("tok_a"), col("tok_b")) >= 0.9)
      .select("id_a", "id_b")
  }

  test("guard injected for distinct inputs; results unchanged") {
    val without = pairs(distinct = true).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule {
      val df = pairs(distinct = true)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("size("), plan)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === without)
      assert(got.contains((1L, 2L))) // the planted exact dup pair
    }
  }

  test("NOT injected for raw (possibly duplicated) inputs — unsound there") {
    withRule {
      val df = pairs(distinct = false)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("size("), plan)
      // (4,5): raw sizes 5 vs 1 but J=1.0 on sets — a raw-size guard would
      // wrongly drop it; the rule declining keeps it
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((4L, 5L)))
    }
  }

  test("idempotent: a hand-guarded predicate gains no second guard") {
    import spark.implicits._
    withRule {
      val t = spark.read.parquet(docsPath)
        .select(col("id"), array_distinct(split(col("text"), " ")).as("tok"))
      val a = t.select(col("id").as("id_a"), col("tok").as("tok_a"))
      val b = t.select(col("id").as("id_b"), col("tok").as("tok_b"))
      val df = a.crossJoin(b)
        .filter(size(col("tok_a")) * 10 >= size(col("tok_b")) * 9)
        .filter(jaccardSim(col("tok_a"), col("tok_b")) >= 0.9)
      val plan = df.queryExecution.optimizedPlan.toString
      // exactly the hand-written size probes (2 per conjunct side), no
      // rule-added t-multiplied pair
      assert(!plan.contains("* 0.9"), plan)
    }
  }
}
