package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused timing harness for the lm_score / lm_append fixed-geometry
  * growth terms: builds the scale probe's LM store at the r11 pinned
  * geometry (nShards = 128) across corpus scales and times lmScore and
  * lmAppend end-to-end on the pinned 50-doc batch, with executor task
  * metrics (run time, GC, input bytes/rows) attached to the min run so
  * growth attributes to scan bytes vs task-count vs JVM noise. This is
  * the harness that attributed the round-9 1.85× growth to the duplicated
  * register subtree + per-surface file opens, verified the r10
  * single-scan rollup flat through 16×, and (r12) measures the residual
  * probed-shard scan term the w1-cluster row-group bound removes.
  *
  * `runMain graft.tools.LmProfile [sfDir] [ks]`
  */
object LmProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 16, 32)
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
    val tap = new AnnProfile.MetricsTap
    spark.sparkContext.addSparkListener(tap)
    val base = graft.Tables.documents(spark, sfDir)
    def t[A](tag: String)(f: => A): Unit = {
      val runs = (1 to 4).map { _ =>
        tap.reset()
        val t0 = System.nanoTime(); f
        ((System.nanoTime() - t0) / 1e9, tap.line)
      }
      val best = runs.minBy(_._1)
      println(f"  $tag%-22s min ${best._1}%6.3f  runs ${runs.map(r => f"${r._1}%.2f").mkString(",")}")
      println(s"    [min-run metrics] ${best._2}")
    }
    for (k <- ks) {
      val tmp = s"/tmp/graft_lmprof/x$k"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      ScaleProbe.scaledCorpus(base, k).write.mode("overwrite")
        .parquet(s"$tmp/docs")
      val docs = spark.read.parquet(s"$tmp/docs")
      val lmDir = s"$tmp/lm"
      graft.operators.LmStore.lmBuild(docs, "doc_id", "text", lmDir, nShards = 128)
      val batch = docs.filter(col("doc_id") < 50).localCheckpoint()
      val regRows = spark.read.option("basePath", s"$lmDir/bigrams")
        .parquet(s"$lmDir/bigrams/gen=g0").count()
      println(s"=== k=$k  corpus=${docs.count()} docs, register $regRows bigrams ===")
      t("lmScore end-to-end") {
        graft.operators.LmStore.lmScore(spark, batch, "doc_id", "text", lmDir).count()
      }
      var seq = 0L
      t("lmAppend end-to-end") {
        seq += 1
        val b = batch.select((-(lit(seq) * 1000 + col("doc_id")) - 1).as("doc_id"),
          col("text"))
        graft.operators.LmStore.lmAppend(spark, b, "doc_id", "text", lmDir)
      }
    }
    spark.stop()
  }
}
