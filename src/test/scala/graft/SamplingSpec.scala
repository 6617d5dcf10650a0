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

  test("portable sample: stable membership, ~fraction kept, quota bounded") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val s1 = Sampling.deterministicSamplePortable(docs, "doc_id", 0.8)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSamplePortable(docs.repartition(7), "doc_id", 0.8)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    val frac = s1.size.toDouble / docs.count()
    assert(frac > 0.7 && frac < 0.9, s"fraction $frac")
    val q = Sampling.stratifiedQuotaPortable(docs, "lang", "doc_id", 7)
    assert(q.groupBy($"lang").count().collect().forall(_.getLong(1) <= 7))
  }

  test("portable sample selector matches a hand-computed md5 verdict") {
    // doc_id 1: md5("1") = c4ca4238a0b923820dcc509a6f75849b -> "c4ca4238" < "cccccccc" -> kept
    // doc_id 3: md5("3") = eccbc87e4b5ce2fe28308fd9f2a7baf3 -> "eccbc87e" >= threshold -> dropped
    val df = Seq(1L, 3L).toDF("doc_id")
    val kept = Sampling.deterministicSamplePortable(df, "doc_id", 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
  }

  test("boundary fractions: 1.0 keeps every row, 0.0 keeps none (both variants)") {
    // fraction=1.0 used to render a 9-char hex threshold that lexicographically
    // dropped ~94% of rows
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val n = docs.count()
    assert(Sampling.deterministicSamplePortable(docs, "doc_id", 1.0).count() === n)
    assert(Sampling.deterministicSamplePortable(docs, "doc_id", 0.0).count() === 0L)
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count() === n)
    assert(Sampling.deterministicSample(docs, "doc_id", 0.0).count() === 0L)
  }

  test("mixingRates fails fast when no positive-target stratum is present") {
    val df = Seq("only_src").toDF("source")
    intercept[IllegalArgumentException] {
      Sampling.mixingRates(df, "source", Map("absent" -> 1.0))
    }
  }

  test("leakageSafeSplit: exact duplicates always share a split, fractions roughly hold") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select($"doc_id", $"text")
    // plant byte-identical duplicates with fresh ids
    val dups = docs.limit(10).select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val split = Sampling.leakageSafeSplit(docs.unionByName(dups), "text",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // same content -> same split, regardless of id
    val straddlers = split.groupBy($"text")
      .agg(countDistinct($"split").as("n"))
      .filter($"n" > 1)
      .count()
    assert(straddlers === 0, "byte-identical documents must share a split")
    // deterministic across evaluations
    val a = split.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = split.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // rough proportions on the base corpus (50 docs: generous bands)
    val byName = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.getOrElse("train", 0L) > byName.getOrElse("val", 0L))
    assert(byName.values.sum === docs.count() + 10)
    // every named split key is one of the declared three
    assert(byName.keySet.subsetOf(Set("train", "val", "test")))

    // degenerate single split takes everything
    val one = Sampling.leakageSafeSplit(docs, "text", Seq("all" -> 1.0))
    assert(one.filter($"split" =!= "all").count() === 0)
  }

  test("tokenBudgetTake: every stratum keeps >=1 row, totals bounded, partition-invariant") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", $"source", $"text")
    val w = size(split($"text", "\\s+"))
    val took = Sampling.tokenBudgetTake(docs, "source", "doc_id", w, 200L)
    val perSource = took.groupBy($"source")
      .agg(count(lit(1)).as("n"), max($"start_tok").as("max_start"))
      .collect()
    val allSources = docs.select($"source").distinct().count()
    assert(perSource.length == allSources,
      "the first doc of a stratum starts at 0 < budget, so no stratum can vanish")
    // every kept row STARTS inside the budget
    assert(perSource.forall(_.getLong(2) < 200L))
    // a budget >= the stratum's total tokens keeps everything
    val all = Sampling.tokenBudgetTake(docs, "source", "doc_id", w, 1000000L)
    assert(all.count() == docs.count())
    // membership is partitioning-independent
    val a = took.select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.tokenBudgetTake(docs.repartition(7), "source", "doc_id", w, 200L)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("frequentItems surfaces the dominant value") {
    val df = (Seq.fill(80)("common") ++ Seq("rare1", "rare2")).toDF("v")
    val freq = Sampling.frequentItems(df, Seq("v"), 0.4)
      .head().getAs[scala.collection.Seq[String]](0)
    assert(freq.contains("common"))
  }

  test("dsirWeights ranks target-like documents above off-domain ones; " +
      "dsirSelect takes them; weights cover the pool") {
    // target domain: medical-ish vocabulary; the raw pool mixes docs
    // written in that vocabulary with docs written in a disjoint one —
    // the in-domain docs must receive strictly larger importance weights
    val target = Seq(
      (100L, "dose trial patient dose outcome trial patient"),
      (101L, "patient outcome dose trial dose patient outcome"),
      (102L, "trial dose outcome patient trial dose outcome"),
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "dose trial patient outcome dose trial"),    // in-domain
      (2L, "patient dose outcome trial patient dose"),  // in-domain
      (3L, "goal match striker goal keeper match"),     // off-domain
      (4L, "keeper striker match goal striker keeper"), // off-domain
    ).toDF("doc_id", "text")
    val w = Sampling.dsirWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L), "weights cover the raw pool")
    assert(math.min(w(1L), w(2L)) > math.max(w(3L), w(4L)),
      s"in-domain docs must outscore off-domain: $w")
    val kept = Sampling.dsirSelect(raw, target, "doc_id", "text", k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
    // the selection plan is a distributed top-k, not a global window
    val plan = Sampling.dsirSelect(raw, target, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}
