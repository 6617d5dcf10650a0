package graft

import graft.multimodal.BinaryOps
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("extractMeta derives metadata from byte length, deterministic") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val meta = BinaryOps.extractMeta(spark, docs)
    assert(meta.count() === docs.count())
    val m = meta.filter(_.doc_id == 0L).head()
    assert(m.width === 64 + m.n_bytes % 512)
    assert(m.height === 64 + (m.n_bytes * 7) % 512)
    assert(m.n_frames === 1 + m.n_bytes % 30)
  }

  test("featurize: deterministic bounded vectors that feed Similarity as-is") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(50)
    val emb1 = BinaryOps.featurize(spark, docs, dim = 8)
    val emb2 = BinaryOps.featurize(spark, docs, dim = 8)
    val v1 = emb1.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val v2 = emb2.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(v1 === v2, "stub featurizer must be deterministic")
    assert(v1.values.forall(v => v.length == 8 && v.forall(x => x >= 0.0 && x < 1.0)))
    // the embedding column plugs straight into the ANN operators
    val topk = graft.operators.Similarity.bruteForceTopK(
      emb1, emb1.filter(col("doc_id") < 2), "doc_id", "embedding", 3)
    assert(topk.groupBy("query_id").count().collect().forall(_.getLong(1) === 3L))
  }

  test("sampleFrames fans out one row per sampled frame") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(20)
    val meta = BinaryOps.extractMeta(spark, docs)
    val frames = BinaryOps.sampleFrames(meta, 5)
    val expected = meta.collect().map(m => (m.n_frames + 4) / 5).sum
    assert(frames.count() === expected)
  }
}
