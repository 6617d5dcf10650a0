package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deterministicSample: stable membership, ~fraction kept") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(docs.repartition(7), "doc_id", 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2, "membership must not depend on partitioning")
    val frac = s1.size.toDouble / docs.count()
    assert(frac > 0.4 && frac < 0.6, s"fraction $frac")
    // monotone: a smaller fraction is a subset of a larger one
    val s3 = Sampling.deterministicSample(docs, "doc_id", 0.2)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(s3.subsetOf(s1))
  }

  test("stratifiedQuota: at most quota rows per stratum, deterministic") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val q = Sampling.stratifiedQuota(docs, "lang", "doc_id", 7)
    val counts = q.groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1))
    assert(counts.forall(_._2 <= 7))
    assert(counts.length === 5) // every stratum represented
    val again = Sampling.stratifiedQuota(docs, "lang", "doc_id", 7)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(again === q.select($"doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("frequentItems surfaces the dominant value") {
    val df = (Seq.fill(80)("common") ++ Seq("rare1", "rare2")).toDF("v")
    val freq = Sampling.frequentItems(df, Seq("v"), 0.4)
      .head().getAs[scala.collection.Seq[String]](0)
    assert(freq.contains("common"))
  }
}
