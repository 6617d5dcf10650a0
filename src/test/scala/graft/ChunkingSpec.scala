package graft

import graft.operators.Chunking
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkDocuments: window math, overlap, and clamped tail") {
    // 10 tokens, size 4, overlap 1 -> step 3 -> chunks at 0,3,6 cover to 9;
    // ceil((10-4)/3)+1 = 3 chunks; the tail is full here (6+4=10)
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.chunkDocuments(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (0, 0, 4, "t0 t1 t2 t3"),
      (1, 3, 4, "t3 t4 t5 t6"),
      (2, 6, 4, "t6 t7 t8 t9")))
  }

  test("short documents yield exactly one whole-doc chunk") {
    val docs = Seq((1L, "a b c"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = Chunking.chunkDocuments(docs, "doc_id", "text", chunkSize = 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(4))).toMap
    assert(got(1L) === ((0, "a b c")))
    assert(got(2L) === ((0, "solo")))
    assert(got(3L) === ((0, ""))) // split("") -> [""]: one empty-ish token
    assert(got.size === 3)
  }

  test("a clamped tail chunk is shorter, never empty, and coverage is complete") {
    // 11 tokens, size 4, step 3 -> chunks at 0,3,6,9; tail has 2 tokens
    val docs = Seq((1L, (0 until 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.chunkDocuments(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getInt(2), r.getInt(3))).sortBy(_._1)
    assert(got.toSeq === Seq((0, 4), (3, 4), (6, 4), (9, 2)))
    assert(got.map(_._2).sum >= 11, "every token appears in at least one chunk")
  }
}
