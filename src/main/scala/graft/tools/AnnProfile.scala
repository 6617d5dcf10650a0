package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused diagnosis harness for the r11 ann_search fixed-geometry knee
  * (SCALEPROBE_r11_fixed.json: 0.92 s at k=16 → 4.42 s at k=32, while
  * every sibling store row stayed flat in the same segment). Replicates
  * the probe's exact setup — scaledEmbeddings corpus, annBuild at the
  * pinned 256-cell geometry, the 3-query vec_id<3 batch, k=10 nProbe=4 —
  * at k=16/24/32, then times the serve end-to-end AND split into its
  * stages (centroid load, probe-side pin, probed-cell collect, path
  * existence checks, pruned scan + score) with executor task metrics per
  * stage, so the growth term is attributed to a named mechanism instead
  * of guessed.
  *
  * `runMain graft.tools.AnnProfile [sfDir] [ks]`
  */
object AnnProfile {

  /** Sums task metrics between reset() and report(). */
  final class MetricsTap extends SparkListener {
    @volatile var tasks = 0
    @volatile var runMs = 0L
    @volatile var gcMs = 0L
    @volatile var bytesRead = 0L
    @volatile var recordsRead = 0L
    @volatile var shuffleWrite = 0L
    def reset(): Unit = { tasks = 0; runMs = 0; gcMs = 0; bytesRead = 0
      recordsRead = 0; shuffleWrite = 0 }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      Option(t.taskMetrics).foreach { m =>
        synchronized {
          tasks += 1
          runMs += m.executorRunTime
          gcMs += m.jvmGCTime
          bytesRead += m.inputMetrics.bytesRead
          recordsRead += m.inputMetrics.recordsRead
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        }
      }
    def line: String =
      f"tasks=$tasks%4d run=${runMs / 1000.0}%7.2fs gc=${gcMs / 1000.0}%5.2fs " +
        f"in=${bytesRead / 1e6}%8.2fMB rows=$recordsRead%8d shw=${shuffleWrite / 1e6}%6.2fMB"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(16, 24, 32)
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
    val tap = new MetricsTap
    spark.sparkContext.addSparkListener(tap)

    val baseEmb = graft.Tables.embeddings(spark, sfDir)
    def t[A](tag: String, iters: Int = 4)(f: => A): Unit = {
      val runs = (1 to iters).map { _ =>
        tap.reset()
        val t0 = System.nanoTime(); f
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, tap.line)
      }
      val best = runs.minBy(_._1)
      println(f"  $tag%-26s min ${best._1}%6.3f  runs ${runs.map(r => f"${r._1}%.2f").mkString(",")}")
      println(s"    [min-run metrics] ${best._2}")
    }

    for (k <- ks) {
      val tmp = s"/tmp/graft_annprof/x$k"
      val fs = new Path(tmp).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(tmp), true)
      ScaleProbe.scaledEmbeddings(baseEmb, k).write.mode("overwrite")
        .parquet(s"$tmp/emb")
      val emb = spark.read.parquet(s"$tmp/emb")
      val annDir = s"$tmp/ann"
      graft.operators.VectorStore.annBuild(emb, "vec_id", "embedding", annDir,
        nCells = 256)
      val embQueries = emb.filter(col("vec_id") < 3).localCheckpoint()
      // cell-size profile of the store (skew check)
      val sizes = spark.read.option("basePath", s"$annDir/cells")
        .parquet(s"$annDir/cells/gen=g0")
        .groupBy(col("cell")).count().select(col("count"))
        .collect().map(_.getLong(0)).sorted
      println(s"=== k=$k corpus=${emb.count()} vecs, cells=${sizes.length}, " +
        s"cell rows min/med/max=${sizes.head}/${sizes(sizes.length / 2)}/${sizes.last} ===")
      t("annSearch end-to-end") {
        graft.operators.VectorStore.annSearch(spark, embQueries, "vec_id",
          "embedding", annDir, k = 10, nProbe = 4).count()
      }
      // staged: reproduce annSearch's internals step by step
      t("  stage: loadCentroids") {
        spark.read.parquet(s"$annDir/centroids").orderBy(col("cell"))
          .select(col("v")).collect()
      }
      val centroids = spark.read.parquet(s"$annDir/centroids")
        .orderBy(col("cell")).select(col("v")).collect()
        .map(_.getSeq[Double](0).toArray)
      t("  stage: probeSide pin") {
        graft.functions.Frames.pinLocal(
          graft.operators.Similarity.probeSide(centroids, embQueries,
            "vec_id", "embedding", 4))
      }
      val q = graft.functions.Frames.pinLocal(
        graft.operators.Similarity.probeSide(centroids, embQueries,
          "vec_id", "embedding", 4))
      t("  stage: probed collect") {
        q.select(col("cell")).distinct().collect()
      }
      val probed = q.select(col("cell")).distinct().collect()
        .map(_.getAs[Number](0).intValue())
      println(s"    probed cells: ${probed.sorted.mkString(",")}")
      val paths = probed.map(c => s"$annDir/cells/gen=g0/cell=$c")
        .filter(p => fs.exists(new Path(p)))
      t("  stage: fs.exists sweep") {
        probed.foreach(c => fs.exists(new Path(s"$annDir/cells/gen=g0/cell=$c")))
      }
      t("  stage: scan+score") {
        val stored = spark.read.option("basePath", s"$annDir/cells")
          .parquet(paths: _*)
        graft.operators.Similarity.scoreProbe(stored, q, 10).count()
      }
    }
    spark.stop()
  }
}
