package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned-layout behavior (the 100 TB fact-table story, SURVEY §4.2):
  * year-partitioned writes get static partition pruning on year filters
  * and dynamic partition pruning (DPP) through joins.
  */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val base: String = {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.orders(spark, TestSpark.sf0001)
      .withColumn("order_year", year($"o_orderdate"))
      .write.partitionBy("order_year").parquet(s"$dir/orders_by_year")
    dir
  }

  private def scannedPartitions(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute so AQE finalizes
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
      }
    scans(df.queryExecution.executedPlan)
      .map(_.metrics.get("numPartitions").map(_.value).getOrElse(0L)).sum
  }

  test("static partition pruning: a year filter reads one partition") {
    val po = spark.read.parquet(s"$base/orders_by_year")
    val all = po.select($"o_orderkey")
    val one = po.filter($"order_year" === 1996).select($"o_orderkey")
    val allParts = scannedPartitions(all)
    val oneParts = scannedPartitions(one)
    assert(allParts >= 7, s"expected >=7 year partitions, got $allParts")
    assert(oneParts === 1, s"expected 1 pruned partition, got $oneParts")
    // and correctness
    assert(one.count() ===
      Tables.orders(spark, TestSpark.sf0001).filter(year($"o_orderdate") === 1996).count())
  }

  test("dynamic partition pruning through a dim join") {
    val po = spark.read.parquet(s"$base/orders_by_year")
    // DPP needs a real Filter over a scan on the build side (a filtered
    // literal relation is constant-folded away before the PartitionPruning
    // rule runs), so the dim must come from storage
    (1995 to 2001).map(y => (y, s"tag_$y")).toDF("order_year", "tag")
      .write.mode("overwrite").parquet(s"$base/year_dim")
    val dim = spark.read.parquet(s"$base/year_dim").filter($"tag" === "tag_1996")
    val joined = po.join(dim, Seq("order_year")).select($"o_orderkey")
    val planStr = joined.queryExecution.executedPlan.toString
    val parts = scannedPartitions(joined)
    assert(parts === 1 || planStr.contains("dynamicpruning"),
      s"DPP did not engage: scanned $parts partitions")
  }
}
