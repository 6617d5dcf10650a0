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

  test("null element in a distinct array: guard keeps the qualifying pair") {
    // array_distinct keeps one null; compute ignores it — [x,null] vs [x]
    // has J = 1.0 but sizes 2 vs 1, which the strict size band would drop
    withRule {
      import spark.implicits._
      val p = java.nio.file.Files.createTempDirectory("graft_jacc_null").toString
      // element_at past the end yields null inside the array constructor
      Seq((1L, "x y"), (2L, "x")).toDF("id", "text")
        .write.mode("overwrite").parquet(p)
      val t = spark.read.parquet(p).select(col("id"),
        array_distinct(array(element_at(split(col("text"), " "), 1),
          element_at(split(col("text"), " "), 2))).as("tok"))
      val a = t.select(col("id").as("id_a"), col("tok").as("tok_a"))
      val b = t.select(col("id").as("id_b"), col("tok").as("tok_b"))
      val df = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .filter(jaccardSim(col("tok_a"), col("tok_b")) >= 0.9)
        .select("id_a", "id_b")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("size("), plan) // guard IS injected...
      // ...and "x y"->[x,y] vs "x"->[x,null]: J([x,y],[x,null]) = 0.5 < 0.9
      // is correctly out, while a doc pair with a retained null and J=1.0
      // must stay in (parquet-backed so the array_distinct Project survives
      // to the optimizer, as above):
      val p2 = java.nio.file.Files.createTempDirectory("graft_jacc_null2").toString
      Seq((1L, Seq[String]("x", null)), (2L, Seq[String]("x")))
        .toDF("id", "tok0").write.mode("overwrite").parquet(p2)
      val t2 = spark.read.parquet(p2)
      val (a2, b2) = (t2.select(col("id").as("id_a"), array_distinct(col("tok0")).as("tok_a")),
        t2.select(col("id").as("id_b"), array_distinct(col("tok0")).as("tok_b")))
      val df2 = a2.crossJoin(b2).filter(col("id_a") < col("id_b"))
        .filter(jaccardSim(col("tok_a"), col("tok_b")) >= 0.9)
        .select("id_a", "id_b")
      assert(df2.queryExecution.optimizedPlan.toString.contains("size("))
      assert(df2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        === Set((1L, 2L)))
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
