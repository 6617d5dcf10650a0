package graft

import graft.operators.{Classify, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the closed-form classifier and the deterministic SemDeDup:
  * the α=1 score decomposition must equal the dense smoothed-matrix
  * computation, argmax ties must break to the smaller label, and the
  * exemplar gate must mark exactly the within-cluster near-copies.
  */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val train = Seq(
    (1L, "alpha alpha shared", "A"),
    (2L, "alpha shared shared", "A"),
    (3L, "beta beta shared", "B"),
    (4L, "beta shared gamma", "B"),
  ).toDF("doc_id", "text", "source")

  test("separable held-out docs classify to their source") {
    val test = Seq(
      (10L, "alpha alpha alpha", "A"),
      (11L, "beta beta gamma", "B"),
    ).toDF("doc_id", "text", "source")
    val got = Classify.nbClassify(train, test, "doc_id", "text", "source")
      .select("doc_id", "pred_label", "correct")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set((10L, "A", 1), (11L, "B", 1)))
  }

  test("charNgrams: sentinels, whitespace folding, every 3-window; " +
      "short text yields its single padded window") {
    import org.apache.spark.sql.functions.col
    val got = Seq("Ab c", "x", "").toDF("t")
      .select(graft.operators.Classify.charNgrams(col("t"), 3))
      .as[Seq[String]].collect()
    // "Ab c" → "_ab_c_" → windows of 3
    assert(got(0) === Seq("_ab", "ab_", "b_c", "_c_"))
    assert(got(1) === Seq("_x_"))
    assert(got(2) === Seq("__"))
  }

  test("langIdClassify: held-out fixture split classifies 100% correct " +
      "across all four languages") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.operators.Classify.syntheticMultilingualCorpus(
      spark.range(0, 120).select(col("id").as("doc_id")))
    val out = graft.operators.Classify.langIdClassify(
        corpus.filter(col("doc_id") % 5 =!= 0),
        corpus.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "lang")
      .select("true_label", "pred_label", "correct")
      .as[(String, String, Int)].collect()
    assert(out.length === 24)
    assert(out.forall(_._3 == 1), out.filter(_._3 == 0).mkString(", "))
    assert(out.map(_._1).toSet === Set("en", "de", "fr", "es"))
  }

  test("langIdClassify breadth: 12 languages / 3 scripts classify 100% " +
      "correct held-out — the Romance cluster separates on full-profile " +
      "likelihood, Cyrillic and Greek coexist in one vocabulary") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.operators.Classify.syntheticMultilingualCorpusWide(
      spark.range(0, 360).select(col("id").as("doc_id")))
    val out = graft.operators.Classify.langIdClassify(
        corpus.filter(col("doc_id") % 5 =!= 0),
        corpus.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "lang")
      .select("true_label", "pred_label", "correct")
      .as[(String, String, Int)].collect()
    assert(out.length === 72)
    assert(out.forall(_._3 == 1), out.filter(_._3 == 0).mkString(", "))
    assert(out.map(_._1).toSet ===
      graft.operators.Classify.langTemplatesWide.map(_._1).toSet)
    assert(out.map(_._1).toSet.size === 12)
  }

  test("score decomposition equals the dense smoothed-matrix score") {
    val test = Seq((10L, "alpha beta shared novel", "A"))
      .toDF("doc_id", "text", "source")
    // dense computation: for each label walk EVERY vocabulary token with
    // explicit Laplace smoothing (the formulation the decomposition is
    // algebra over); `novel` is out-of-vocabulary and must be dropped
    val docs = train.select(col("source"), explode(split(col("text"), "\\s+")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.map(_._2).distinct.sorted
    val labels = docs.map(_._1).distinct.sorted
    val dense = labels.map { l =>
      val c = vocab.map(t => t -> docs.count(d => d == (l, t)).toDouble).toMap
      val nTok = c.values.sum
      val prior = math.log(2.0 / 4.0)
      val score = prior + Seq("alpha", "beta", "shared")
        .map(t => math.log((c(t) + 1.0) / (nTok + vocab.size))).sum
      l -> BigDecimal(score + 1e-8)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Classify.nbClassify(train, test, "doc_id", "text", "source")
      .select("pred_label", "score").collect().head
    assert(got.getDouble(1) === dense(got.getString(0)))
    assert(got.getString(0) === dense.maxBy(_._2)._1)
  }

  test("exact score ties break to the lexicographically smaller label") {
    val sym = Seq(
      (1L, "x common", "B"), (2L, "x common", "A"),
    ).toDF("doc_id", "text", "source")
    val test = Seq((10L, "common common", "B")).toDF("doc_id", "text", "source")
    val got = Classify.nbClassify(sym, test, "doc_id", "text", "source")
      .collect().head
    assert(got.getString(2) === "A")
  }

  test("langIdPredict: exactly one row per doc; the margin gate abstains " +
      "sub-margin docs to 'und', zero-overlap docs to 'und' with a null " +
      "score, and in-set docs keep their language") {
    val corpus = Classify.syntheticMultilingualCorpusWithUnknown(
      spark.range(0, 200).select(col("id").as("doc_id")))
    val train = corpus.filter(col("lang") =!= "xx")
    val out = Classify.langIdPredict(train, corpus, "doc_id", "text",
        "lang", n = 3, minMargin = 3.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(out.size === 200, "one row per input doc — the total contract")
    val expected = Map(0L -> "en", 1L -> "de", 2L -> "fr", 3L -> "es")
    for (id <- 0L until 200L) {
      val (pred, score) = out(id)
      if (id % 5 == 4) {
        assert(pred === "und", s"out-of-set doc $id must abstain: $pred")
        if (id % 2 == 0)
          assert(score.isEmpty, s"zero-overlap doc $id must score null")
        else
          assert(score.nonEmpty,
            s"tail-scored doc $id keeps its top score as evidence")
      } else {
        assert(pred === expected(id % 4), s"in-set doc $id: $pred")
        assert(score.nonEmpty)
      }
    }
    // minMargin=0 is the force-assign shape on every SCORED doc: the
    // tail-scored unknowns now pick some nearest profile, the
    // zero-overlap unknowns still surface as und (they have no score to
    // force) — the r15 behavior plus the totality fix
    val loose = Classify.langIdPredict(train, corpus, "doc_id", "text",
        "lang", n = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(loose.size === 200)
    for (id <- 0L until 200L) {
      if (id % 5 == 4 && id % 2 == 0) assert(loose(id) === "und")
      else assert(loose(id) !== "und",
        s"doc $id must be force-assigned under minMargin=0")
    }
  }

  test("semDedup: copies of the exemplar are dups, the exemplar and far " +
      "members are not, clusters follow the nearest seed") {
    val e1 = Array.tabulate(8)(i => if (i == 0) 1f else 0f)
    val e2 = Array.tabulate(8)(i => if (i == 1) 1f else 0f)
    val near1 = Array.tabulate(8)(i =>
      if (i == 0) 1f else if (i == 7) 0.01f else 0f)
    val far1 = Array.tabulate(8)(i => if (i == 0) 1f else 0.9f)
    val emb = Seq(
      (0L, e1), (1L, e2),        // seed centroids (two smallest ids)
      (2L, e1), (3L, near1),     // copies/near-copies of exemplar 0
      (4L, far1),                // cluster 0, but cos to exemplar < 0.85
      (5L, e2),                  // copy of exemplar 1
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedupExemplar(emb, "vec_id", "embedding",
      k = 2, tau = 0.85)
      .select("vec_id", "cluster_id", "exemplar_id", "is_dup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got === Set(
      (0L, 0L, 0L, 0), (2L, 0L, 0L, 1), (3L, 0L, 0L, 1), (4L, 0L, 0L, 0),
      (1L, 1L, 1L, 0), (5L, 1L, 1L, 1)))
  }

  test("semDedupTrained: structural laws — every vector assigned exactly " +
      "once, exemplars are their clusters' min ids and never dups, dup " +
      "implies cos_ex >= tau") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf0001)
    val got = Similarity.semDedupTrained(emb, "vec_id", "embedding",
      k = 8, tau = 0.85).cache()
    try {
      assert(got.count() === emb.count())
      assert(got.select("vec_id").distinct().count() === emb.count())
      // exemplar = min member id per cluster, and is never marked dup
      val badEx = got.groupBy("cluster_id")
        .agg(org.apache.spark.sql.functions.min("vec_id").as("m"),
          org.apache.spark.sql.functions.first("exemplar_id").as("e"))
        .filter($"m" =!= $"e")
      assert(badEx.isEmpty)
      assert(got.filter($"vec_id" === $"exemplar_id" && $"is_dup" === 1).isEmpty)
      assert(got.filter($"is_dup" === 1 && $"cos_ex" < 0.85).isEmpty)
      // trained centroids index 0..k-1
      assert(got.agg(org.apache.spark.sql.functions.max("cluster_id"))
        .head().getInt(0) < 8)
    } finally { got.unpersist(); () }
  }

  test("semDedupTrainedSweep records centroid-geometry sensitivity; the " +
      "k=1 row agrees exactly with the deterministic twin") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf0001)
    val n = emb.count()
    val sweep = Similarity.semDedupTrainedSweep(emb, "vec_id", "embedding",
        ks = Seq(1, 4, 8), tau = 0.85, fitCaps = Seq(60L, 100000L))
      .collect().map(r => ((r.getInt(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(sweep.size === 6) // one row per (k, fit_cap)
    for (((k, cap), (cnt, de, dt, agree)) <- sweep) {
      assert(cnt === n, s"k=$k cap=$cap must cover the corpus")
      assert(agree >= 0.0 && agree <= 1.0)
      assert(de >= 0L && dt >= 0L)
      // at k=1 both paths collapse to the identical single-exemplar
      // geometry (same min-id exemplar, same cosines) — agreement is
      // EXACTLY 1 regardless of the fit sample; anything else means the
      // trained path diverged structurally, not geometrically
      if (k == 1) assert(agree === 1.0, s"k=1 cap=$cap agreement $agree")
    }
  }
}
