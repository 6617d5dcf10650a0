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

  test("hybridRerankFromIndex equals hybridRerank across a two-generation store") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_hyb").toString + "/idx"
    Indexing.indexBuild(docs.filter($"doc_id" % 2 === 0), "doc_id", "text",
      dir, nShards = 8)
    Indexing.indexAppend(docs.filter($"doc_id" % 2 === 1), "doc_id", "text", dir)
    val queries = docs.filter($"doc_id" < 3)
    val served = Retrieval.hybridRerankFromIndex(spark, queries, emb,
      "doc_id", "text", "vec_id", "embedding", dir, k = 5, candK = 10)
      .orderBy("query_id", "rank").collect().toSeq
    val recomputed = Retrieval.hybridRerank(docs, queries, emb,
      "doc_id", "text", "vec_id", "embedding", k = 5, candK = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served === recomputed)
  }

  test("hybridRerank with zero semantic weight reproduces the BM25 order") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val queries = docs.filter($"doc_id" < 3)
    val hybrid = Retrieval.hybridRerank(docs, queries, emb, "doc_id", "text",
      "vec_id", "embedding", k = 5, candK = 10, wLex = 1.0, wSem = 0.0)
      .select($"query_id", $"rank", $"doc_id")
      .as[(Long, Int, Long)].collect().toSet
    val lexical = Retrieval.bm25TopK(docs, queries, "doc_id", "text", k = 5)
      .select(col("query_id"), col("rank"), col("doc_id"))
      .as[(Long, Int, Long)].collect().toSet
    assert(hybrid === lexical)
  }

  test("hybridRerank scores a zero-norm embedding as cosine 0, never a NaN rank") {
    import org.apache.spark.sql.functions.col
    // three docs sharing vocabulary so BM25 pairs them all; doc 1 carries
    // an all-zero embedding — 0/0 cosine is NaN, and NaN sorts LARGEST in
    // a desc rank, so an unguarded blend would put the zero vector first
    val docs = Seq(
      (0L, "shared words alpha beta gamma delta"),
      (1L, "shared words alpha beta gamma epsilon"),
      (2L, "shared words alpha beta gamma zeta")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 2f, 3f)),
      (1L, Array(0f, 0f, 0f)),
      (2L, Array(3f, 2f, 1f))).toDF("vec_id", "embedding")
    val res = Retrieval.hybridRerank(docs, docs.filter($"doc_id" === 0), emb,
      "doc_id", "text", "vec_id", "embedding", k = 2, candK = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("cos_sim"), r.getAs[Double]("hybrid")))).toMap
    assert(!res.values.exists(v => v._1.isNaN || v._2.isNaN))
    assert(res(1L)._1 === 0.0, "zero-norm embedding must score cosine 0")
    assert(res(2L)._1 > 0.0)
  }

  test("hybridRerank blends in the semantic signal and keeps k rows per query") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val res = Retrieval.hybridRerank(docs, docs.filter($"doc_id" < 3), emb,
      "doc_id", "text", "vec_id", "embedding", k = 5, candK = 10)
      .collect()
    assert(res.length === 15, "3 queries × top-5")
    assert(res.forall(r => math.abs(r.getAs[Double]("cos_sim")) <= 1.0 + 1e-9))
    assert(res.forall(r => r.getAs[Double]("hybrid") <= 0.5 + 0.5 + 1e-9))
  }
}
