package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Job-count profiler for the ccApply per-batch constant: builds the
  * scale probe's cluster store, registers a listener, runs one 50-doc
  * apply and one 5000-doc apply, and prints every Spark job's duration —
  * the constant is (job count × scheduling floor) + the store reads, and
  * this attributes it.
  *
  * `runMain graft.tools.CcProfile [sfDir]`
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.Tables.documents(spark, sfDir)
    val tmp = "/tmp/graft_ccprof"
    ScaleProbe.scaledCorpus(base, 4).write.mode("overwrite").parquet(s"$tmp/docs")
    val docs = spark.read.parquet(s"$tmp/docs")
    val ccDir = s"$tmp/cc"
    graft.operators.ClusterStore.ccBuild(docs, "doc_id", "text", ccDir,
      nBuckets = 128)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (js.time,
          Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short")))
            .getOrElse("?")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (je.time, "?"))
        lines.add(f"  job ${je.jobId}%3d ${(je.time - t0) / 1e3}%6.2fs  $desc")
      }
    })
    var seq = 0L
    def applyBatch(n: Int): Unit = {
      seq += 1
      val batch = docs.filter(col("doc_id") < n)
        .select((-(lit(seq) * 1000000 + col("doc_id")) - 1).as("doc_id"),
          col("text")).localCheckpoint()
      lines.clear()
      val t0 = System.nanoTime()
      graft.operators.ClusterStore.ccApply(spark, ccDir, batch, "doc_id", "text")
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      println(f"=== ccApply of $n docs: $dt%.2f s, ${lines.size} jobs ===")
      lines.forEach(println(_))
    }
    applyBatch(50) // warm
    applyBatch(50)
    applyBatch(50)
    applyBatch(5000)
    spark.stop()
  }
}
