package graft.tools

import org.apache.spark.sql.SparkSession

/** Fresh-JVM isolation re-timing — the attribution instrument for
  * suite-position effects in the bench record (VERDICT r14 finding #1:
  * the common-162 subset drifted +7.9% between the r13 and r14 committed
  * records, with README blaming the bigger single-session JVM — codegen
  * class volume + GC — but nothing measured separating that from real
  * per-query cost).
  *
  * One invocation = one JVM = one SparkSession timing ONE query with
  * exactly Bench's discipline (same session config, same noop-sink
  * materialization, same untimed warmup action, min-of-N) and printing
  * one JSON line. A driver script invokes it once per query so every
  * measurement starts from a cold JVM with zero accumulated codegen
  * classes, broadcasts, or checkpoint blocks — the delta between this
  * and the in-suite sidecar figure IS the suite-position cost.
  */
object BenchIsolate {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchIsolate <sfDir> <queryName> [iters]")
    val sfDir = args(0)
    val name = args(1)
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
    spark.sparkContext.setLogLevel("WARN")
    // Bench's session warmup: one shuffle + one codegen'd agg, untimed
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey")
      .count().write.format("noop").mode("overwrite").save()
    val fn = graft.SparkEntry.queries(name)
    val ld0 = graft.functions.HostStats.loadAvg1
    val times = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val ld1 = graft.functions.HostStats.loadAvg1
    spark.stop()
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"query":"$name","min":${f(times.min)},"runs":[${
      times.map(f).mkString(",")}],"ld":[${f(ld0)},${f(ld1)}]}""")
  }
}
