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

  test("sampleFrames fans out one row per sampled frame") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(20)
    val meta = BinaryOps.extractMeta(spark, docs)
    val frames = BinaryOps.sampleFrames(meta, 5)
    val expected = meta.collect().map(m => (m.n_frames + 4) / 5).sum
    assert(frames.count() === expected)
  }
}
