package graft

import graft.operators.LanguageModel
import org.scalatest.funsuite.AnyFunSuite

class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigramLogProb matches hand-computed add-1 smoothed scores") {
    // corpus: bigrams (a,b)x2 (a,c)x1; c(a)=3; V={a,b,c}=3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = LanguageModel.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r6(x: Double) = math.rint((x + 1e-8) * 1e6) / 1e6
    // P(b|a) = (2+1)/(3+3) = 0.5; P(c|a) = (1+1)/(3+3) = 1/3
    assert(got(1L) === ((1L, r6(math.log(0.5)))))
    assert(got(2L) === ((1L, r6(math.log(0.5)))))
    assert(got(3L) === ((1L, r6(math.log(1.0 / 3)))))
  }

  test("single-token and empty docs have no bigrams and are omitted") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text")
    val ids = LanguageModel.bigramLogProb(docs, "doc_id", "text")
      .select("id").as[Long].collect().toSet
    assert(ids === Set(3L))
  }

  test("train-then-score: unseen gibberish lands exactly on the smoothing floor, below corpus mean") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select($"doc_id", $"text")
    val gibberish = Seq((100000L, "zxqv qqjx wvzk pfft glrb nnsd")).toDF("doc_id", "text")
    val v = docs.select(org.apache.spark.sql.functions.explode(
      org.apache.spark.sql.functions.split($"text", "\\s+")).as("w"))
      .distinct().count()
    val g = LanguageModel.bigramLogProbAgainst(docs, gibberish, "doc_id", "text")
      .head()
    def r6(x: Double) = math.rint((x + 1e-8) * 1e6) / 1e6
    // every gibberish bigram is unseen with an unseen context:
    // (0+1)/(0+1·V) = 1/V — the add-k floor
    assert(g.getDouble(2) === r6(math.log(1.0 / v)))
    // and the corpus's own register sits above that floor
    val corpusScores = LanguageModel.bigramLogProbAgainst(docs, docs, "doc_id", "text")
      .collect().map(_.getDouble(2))
    val corpusAvg = corpusScores.sum / corpusScores.length
    assert(g.getDouble(2) < corpusAvg,
      s"gibberish ${g.getDouble(2)} should sit below the corpus mean $corpusAvg")
  }

  test("perplexityBuckets: per-source terciles order head ≥ middle ≥ tail " +
      "and partition every scored doc") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val out = LanguageModel.perplexityBuckets(docs, "doc_id", "text",
      "source").collect()
    // every bigram-scored doc lands in exactly one bucket
    val scored = LanguageModel.bigramLogProb(docs, "doc_id", "text").count()
    assert(out.length.toLong === scored)
    for ((src, rows) <- out.groupBy(_.getString(1))) {
      val byBucket = rows.groupBy(_.getString(4))
        .view.mapValues(_.map(_.getDouble(3))).toMap
      assert(byBucket.keySet === Set("head", "middle", "tail"),
        s"$src must populate all three buckets: ${byBucket.keySet}")
      // ordering: the buckets are half-open score intervals (head ≥ t2,
      // t1 ≤ middle < t2, tail < t1), so the worst head outscores the
      // best middle, which outscores the best tail — the CCNet policy
      // invariant per source
      assert(byBucket("head").min >= byBucket("middle").max,
        s"$src: a middle doc outscored a head doc")
      assert(byBucket("middle").min >= byBucket("tail").max,
        s"$src: a tail doc outscored a middle doc")
      // terciles: no bucket swallows the source (ties can skew the
      // thirds, but an empty or >60% bucket means the cuts are wrong)
      val n = rows.length.toDouble
      for ((b, vs) <- byBucket)
        assert(vs.length > 0 && vs.length < n * 0.6,
          s"$src bucket $b holds ${vs.length} of $n")
    }
  }
}
