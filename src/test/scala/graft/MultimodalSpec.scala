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

  // Hand-assembled minimal containers: a 640×480 PNG prefix (signature +
  // IHDR, the spec-required first chunk) and a 640×480 JPEG (SOI, APP0,
  // SOF0 frame header, EOI).
  private def pngFixture(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC not validated by the header parser
    out.array()
  }

  private def jpegFixture(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 13 + 2)
    out.put(0xff.toByte).put(0xd8.toByte)                    // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16)       // APP0, len 16
    out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    out.putShort(0x0101.toShort).put(0.toByte)
    out.putShort(1).putShort(1).put(0.toByte).put(0.toByte)
    out.put(0xff.toByte).put(0xc0.toByte).putShort(11)       // SOF0, len 11
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    out.put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte) // 1 component
    out.put(0xff.toByte).put(0xd9.toByte)                    // EOI
    out.array()
  }

  test("parseImageHeader reads PNG IHDR and JPEG SOF dimensions") {
    assert(BinaryOps.parseImageHeader(pngFixture(640, 480)) === Some((640, 480)))
    assert(BinaryOps.parseImageHeader(jpegFixture(1920, 1080)) === Some((1920, 1080)))
    // malformed/truncated/non-image payloads fall through to the stub
    assert(BinaryOps.parseImageHeader(pngFixture(640, 480).take(20)) === None)
    assert(BinaryOps.parseImageHeader("plain text payload".getBytes("UTF-8")) === None)
    assert(BinaryOps.parseImageHeader(Array[Byte]()) === None)
    assert(BinaryOps.parseImageHeader(pngFixture(0, 480)) === None)
  }

  test("extractMetaBinary decodes embedded image fixtures, stubs the rest") {
    import spark.implicits._
    val rows = Seq(
      (1L, pngFixture(640, 480)),
      (2L, jpegFixture(320, 240)),
      (3L, "not an image at all just bytes".getBytes("UTF-8")),
    ).toDF("doc_id", "payload")
    val meta = BinaryOps.extractMetaBinary(spark, rows)
      .collect().map(m => m.doc_id -> m).toMap
    assert((meta(1L).width, meta(1L).height, meta(1L).n_frames) === ((640, 480, 1)))
    assert((meta(2L).width, meta(2L).height, meta(2L).n_frames) === ((320, 240, 1)))
    val stub = BinaryOps.stubDecode(3L, "not an image at all just bytes".getBytes("UTF-8"))
    assert(meta(3L) === stub, "non-image payloads take the stub path unchanged")
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
