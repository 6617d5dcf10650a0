package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the Bloom-prefiltered decontamination path: exactness (the
  * bloom report equals the exact report at ANY filter geometry — tiny
  * filters only raise the verify join's input, never change its output),
  * no false negatives on the membership probe itself, and plausible
  * selectivity at a sane geometry.
  */
class BloomDecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.sf0001)
  private lazy val bench = docs.filter(col("doc_id") % 7 === 0)

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect().map(_.toSeq).toSeq

  test("bloom report == exact report at a sane geometry") {
    val exact = Decontaminate.contaminationReport(docs, bench, "doc_id", "text", n = 8)
    val bloom = Decontaminate.bloomContaminationReport(docs, bench, "doc_id", "text",
      n = 8, mBits = 1L << 17, k = 5)
    assert(canon(bloom) === canon(exact))
  }

  test("bloom report is exact even with a saturated (tiny) filter") {
    // 64 bits for thousands of grams: near-100% fpp — the prefilter
    // passes almost everything, the verify join restores exactness.
    val exact = Decontaminate.contaminationReport(docs, bench, "doc_id", "text", n = 8)
    val bloom = Decontaminate.bloomContaminationReport(docs, bench, "doc_id", "text",
      n = 8, mBits = 64L, k = 2)
    assert(canon(bloom) === canon(exact))
  }

  test("membership probe has no false negatives") {
    val grams = Seq("a b c", "d e f", "x y z", "lorem ipsum dolor").toDF("g")
    val words = Decontaminate.bloomBuild(grams, "g", mBits = 1L << 10, k = 5)
    val misses = grams
      .filter(!Decontaminate.bloomMightContain(col("g"), words, 1L << 10, 5))
      .count()
    assert(misses === 0L)
  }

  test("prefilter is selective at a sized geometry") {
    // Non-member probes: mostly rejected when mBits is sized for the
    // member count (fpp ~ (1 - e^(-kn/m))^k << 1).
    val members = (0 until 500).map(i => s"member_$i").toDF("g")
    val words = Decontaminate.bloomBuild(members, "g", mBits = 1L << 14, k = 5)
    val probes = (0 until 1000).map(i => s"absent_$i").toDF("g")
    val fp = probes
      .filter(Decontaminate.bloomMightContain(col("g"), words, 1L << 14, 5))
      .count()
    assert(fp < 50L, s"false-positive count $fp out of 1000 — filter not selective")
  }

  test("bloom probe stays codegen'd (no UDF in the plan)") {
    val words = Decontaminate.bloomBuild(Seq("a").toDF("g"), "g", 1L << 10, 3)
    val plan = Seq("a", "b").toDF("g")
      .filter(Decontaminate.bloomMightContain(col("g"), words, 1L << 10, 3))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }
}
