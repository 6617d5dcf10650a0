package graft

import graft.io.WarcIngest
import graft.streaming.CrawlStream
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the streaming crawl store: one surviving row per canonical
  * resource with first-batch/first-fetch preference, cross-batch
  * re-fetches dropped against the persisted key surface, redelivered
  * batches converge (replay reads only prior generations), and
  * compaction is serve-invariant. Batches drive [[CrawlStream.ingestBatch]]
  * directly with explicit ids — no file-order nondeterminism.
  */
class CrawlStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One-blob frame: ids fetch resource id%5 (so 5 resources per batch
    * collide across different ids), tracked query params vary.
    */
  private def blobs(fileId: Long, ids: Seq[Long]) = {
    val uriOf = (id: Long) =>
      s"${if (id % 2 == 0) "http" else "https"}://www.site.example.com/p/${id % 5}?utm_b=$id"
    Seq((fileId, WarcIngest.buildWarcFile(fileId,
      ids.map(i => i -> s"body of $i"), uriOf))).toDF("file_id", "payload")
  }

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_crawl").toString

  test("in-batch keep-first + cross-batch drop against persisted keys") {
    val dir = freshDir()
    // batch 1: ids 0..9 → resources 0..4, first fetch (lowest id) wins
    CrawlStream.ingestBatch(spark, blobs(0, 0L until 10L), 1, dir)
    val after1 = CrawlStream.corpus(spark, dir)
      .select("resource_key", "doc_id").as[(String, Long)].collect().toMap
    assert(after1.size === 5)
    assert(after1("site.example.com/p/3") === 3L)
    // batch 2: ids 10..19 hit the SAME resources → all dropped
    CrawlStream.ingestBatch(spark, blobs(1, 10L until 20L), 2, dir)
    val after2 = CrawlStream.corpus(spark, dir)
      .select("resource_key", "doc_id").as[(String, Long)].collect().toMap
    assert(after2 === after1)
    // batch 3: a new resource appears alongside re-fetches
    val uriOf3 = (id: Long) => s"https://site.example.com/new/$id"
    val b3 = Seq((2L, WarcIngest.buildWarcFile(2L, Seq(30L -> "fresh"), uriOf3)))
      .toDF("file_id", "payload")
    CrawlStream.ingestBatch(spark, b3, 3, dir)
    assert(CrawlStream.corpus(spark, dir).count() === 6)
  }

  test("gzip blobs ingest identically: a .warc.gz batch builds the same " +
      "store state as the plain batch of the same records") {
    val uriOf = (id: Long) =>
      s"${if (id % 2 == 0) "http" else "https"}://www.site.example.com/p/${id % 5}?utm_b=$id"
    val docs = (0L until 10L).map(i => i -> s"body of $i")
    val plainDir = freshDir()
    CrawlStream.ingestBatch(spark,
      Seq((0L, WarcIngest.buildWarcFile(0L, docs, uriOf)))
        .toDF("file_id", "payload"), 1, plainDir)
    val gzDir = freshDir()
    CrawlStream.ingestBatch(spark,
      Seq((0L, WarcIngest.buildWarcFileGz(0L, docs, uriOf)))
        .toDF("file_id", "payload"), 1, gzDir)
    val p = CrawlStream.corpus(spark, plainDir)
      .select("resource_key", "doc_id").as[(String, Long)].collect().sorted
    val g = CrawlStream.corpus(spark, gzDir)
      .select("resource_key", "doc_id").as[(String, Long)].collect().sorted
    assert(p.nonEmpty && g === p)
  }

  test("replayed batch converges: no dup rows, no self-collision wipe") {
    val dir = freshDir()
    CrawlStream.ingestBatch(spark, blobs(0, 0L until 10L), 1, dir)
    CrawlStream.ingestBatch(spark, blobs(1, 20L until 30L), 2, dir)
    val before = CrawlStream.corpus(spark, dir).orderBy("resource_key", "doc_id")
      .collect().toSeq
    // redeliver batch 2 (at-least-once foreachBatch): must rewrite
    // identical content, reading only generations < 2
    CrawlStream.ingestBatch(spark, blobs(1, 20L until 30L), 2, dir)
    val after = CrawlStream.corpus(spark, dir).orderBy("resource_key", "doc_id")
      .collect().toSeq
    assert(after === before)
  }

  test("compaction folds generations, serve-invariant") {
    val dir = freshDir()
    CrawlStream.ingestBatch(spark, blobs(0, 0L until 5L), 1, dir)
    val uriOf = (id: Long) => s"https://other.example.com/q/$id"
    val b2 = Seq((1L, WarcIngest.buildWarcFile(1L,
      Seq(7L -> "seven", 8L -> "eight"), uriOf))).toDF("file_id", "payload")
    CrawlStream.ingestBatch(spark, b2, 2, dir)
    val before = CrawlStream.corpus(spark, dir).orderBy("resource_key")
      .collect().toSeq
    CrawlStream.compactState(spark, dir, uptoBatch = 3)
    val after = CrawlStream.corpus(spark, dir).orderBy("resource_key")
      .collect().toSeq
    assert(after === before)
    assert(graft.operators.Generations.live(spark, dir).count(_.startsWith("c")) === 1)
  }

  test("AvailableNow drain over parquet blob drops == direct batches") {
    val dir = freshDir()
    val src = freshDir()
    blobs(0, 0L until 10L).write.mode("append").parquet(src)
    CrawlStream.crawlIngestAvailableNow(spark, src, dir)
    val keys = CrawlStream.corpus(spark, dir)
      .select("resource_key").as[String].collect().sorted
    assert(keys.length === 5)
    assert(keys.forall(_.startsWith("site.example.com/p/")))
    // second drain with the same checkpoint: nothing new → no change
    CrawlStream.crawlIngestAvailableNow(spark, src, dir)
    assert(CrawlStream.corpus(spark, dir).count() === 5)
  }
}
