package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Where does a query's wall-clock actually go? For each named query:
  * `runMain graft.tools.QueryProfile <q1,q2,...> [sfDir] [iters]`
  * runs the bench-identical noop action `iters` times (first run = warm-up,
  * reported separately) and prints, per run: wall seconds, planning seconds
  * (analysis+optimization+physical, forced before execution), #jobs,
  * #stages, #tasks, summed executor task time, summed shuffle write bytes.
  * High wall with low task time = driver/scheduling/planning bound; high
  * task time on one stage = compute bound (guide §1/§7).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val shufW = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shufW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        if (sys.env.contains("GRAFT_PROFILE_STAGES")) {
          val i = s.stageInfo
          val dur = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L))
          println(f"[stage] id=${i.stageId} dur=${dur}ms tasks=${i.numTasks} " +
            f"exec=${i.taskMetrics.executorRunTime}ms " +
            f"srMB=${i.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6}%.1f " +
            i.name.takeWhile(_ != '\n').take(90))
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })

    // session warmup identical to Bench
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()

    names.foreach { name =>
      (1 to iters).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); shufW.set(0)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val tPlan0 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val tPlan1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        // listener events are async; give the bus a moment to drain
        Thread.sleep(300)
        println(f"[profile] $name run$i wall=${(t1 - t0) / 1e9}%.3f " +
          f"build=${(tPlan0 - t0) / 1e9}%.3f plan=${(tPlan1 - tPlan0) / 1e9}%.3f " +
          f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
          f"taskSec=${taskMs.get / 1e3}%.2f shufMB=${shufW.get / 1e6}%.1f")
      }
    }
    spark.stop()
  }
}
