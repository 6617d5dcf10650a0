package graft.tools

import org.apache.spark.sql.SparkSession

/** Child-process half of the cross-process writer-lock law
  * (StoreLifecycleSpec): acquires [[graft.operators.Generations]]'
  * writer lock on a store directory through the REAL acquisition path
  * (its own SparkSession and Hadoop FileSystem — a genuinely separate
  * JVM, not a simulated foreign lock file), touches a sentinel file so
  * the parent knows the lock is held, then holds it for `holdMs`.
  *
  * `runMain graft.tools.LockHold <storeDir> <sentinelFile> <holdMs>`
  */
object LockHold {
  def main(args: Array[String]): Unit = {
    val Array(storeDir, sentinel, holdMs) = args
    val spark = SparkSession.builder()
      .master("local[1]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Generations.withWriterLock(spark, storeDir) {
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(sentinel), "held\n")
      Thread.sleep(holdMs.toLong)
    }
    spark.stop()
  }
}
