package graft

import graft.operators.{Indexing, Retrieval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for BM25 serving: scores served from the persisted index store
  * equal the recomputed [[Retrieval.bm25TopK]] scores, including across
  * an incremental append (the store's segment merge must reproduce the
  * exact corpus statistics).
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25FromIndex equals bm25TopK across a two-generation store") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString + "/idx"
    Indexing.indexBuild(docs.filter($"doc_id" % 2 === 0), "doc_id", "text",
      dir, nShards = 8)
    Indexing.indexAppend(docs.filter($"doc_id" % 2 === 1), "doc_id", "text", dir)

    val queries = docs.filter($"doc_id" < 3)
    val served = Retrieval.bm25FromIndex(spark, queries, "doc_id", "text",
      dir, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    val recomputed = Retrieval.bm25TopK(docs, queries, "doc_id", "text", k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served === recomputed)
  }
}
