package graft

import graft.functions.BpeTrainer
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // "low" appears 5×, "lower" 2×, "new" 3× — classic BPE toy corpus:
  // the first merges must assemble the 'lo'/'ow'/'low' family
  lazy val docs = Seq(
    "low low low low low",
    "lower lower new new new",
  ).toDF("text")

  test("learnMerges finds the highest-frequency adjacent pairs in order") {
    val merges = BpeTrainer.learnMerges(spark, docs, "text", nMerges = 3)
    assert(merges.length === 3)
    // l+o occurs in low(5) + lower(2) = 7, the unambiguous first merge
    assert(merges.head === ("l", "o"))
    // after (l,o): pair (lo,w) occurs 7 — the second merge
    assert(merges(1) === ("lo", "w"))
    // after (lo,w): remaining pairs — (low,e)=2, (e,r)=2, (n,e)=3, (e,w)=3;
    // freq ties break lexicographically: (e,w) beats (n,e)
    assert(merges(2) === ("e", "w"))
  }

  test("segmentation applies merges leftmost-first over the vocab table") {
    val merges = BpeTrainer.learnMerges(spark, docs, "text", nMerges = 2)
    val seg = BpeTrainer.segmentation(spark, docs, "text", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg("low") === Seq("low"))
    assert(seg("lower") === Seq("low", "e", "r"))
    assert(seg("new") === Seq("n", "e", "w"))
    // every segmentation reassembles its word exactly
    seg.foreach { case (w, subs) => assert(subs.mkString === w) }
  }

  test("stops early when no pair reaches minCount") {
    val tiny = Seq("ab cd").toDF("text")
    // each pair occurs once -> below minCount 2 -> zero merges
    assert(BpeTrainer.learnMerges(spark, tiny, "text", nMerges = 10).isEmpty)
  }

  test("encode: broadcast-join segmentation, ordered stream, OOV falls to chars") {
    val corpus = Seq(
      (1L, "low lower low"),
      (2L, "new unseen low"),
    ).toDF("doc_id", "text")
    val merges = BpeTrainer.learnMerges(spark, docs, "text", nMerges = 2)
    // vocab trained on `docs` — "unseen" is OOV for the segmentation
    val seg = BpeTrainer.segmentation(spark, docs, "text", merges)
    val enc = BpeTrainer.encode(corpus, "doc_id", "text", seg)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getSeq[String](3)))).toMap
    // document order preserved: low | low,e,r | low
    assert(enc(1L) === ((3L, 5, Seq("low", "low", "e", "r", "low"))))
    // OOV word "unseen" → character symbols, in place
    assert(enc(2L)._3 === Seq("n", "e", "w") ++ "unseen".map(_.toString) ++ Seq("low"))
    assert(enc(2L)._1 === 3L && enc(2L)._2 === 10)
    // losslessness: concatenated tokens reassemble the whitespace-free text
    enc.foreach { case (id, (_, _, toks)) =>
      val raw = corpus.filter($"doc_id" === id).head().getString(1)
      assert(toks.mkString === raw.replaceAll("\\s+", ""))
    }
    // zero merges: encoding degenerates to per-character symbols
    val seg0 = BpeTrainer.segmentation(spark, docs, "text", Seq.empty)
    val enc0 = BpeTrainer.encode(corpus, "doc_id", "text", seg0)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(enc0(1L) === "lowlowerlow".length)
    // more merges never lengthen the stream
    assert(enc(1L)._2 <= enc0(1L))
  }

  test("trains on the real corpus; token counts shrink monotonically") {
    val corpus = Tables.documents(spark, TestSpark.sf0001)
    val merges = BpeTrainer.learnMerges(spark, corpus, "text", nMerges = 10)
    assert(merges.length === 10)
    val seg = BpeTrainer.segmentation(spark, corpus, "text", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // merges only ever concatenate: every word's subword count <= its length
    seg.foreach { case (w, subs) =>
      assert(subs.mkString === w)
      assert(subs.length <= w.length)
    }
    // at least one learned merge actually fused something
    assert(seg.values.exists(subs => subs.exists(_.length > 1)))
  }
}
