package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for scan pruning at scale: Z-order (Morton)
  * clustering over multiple columns, the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY` — rows close in the multi-dimensional
  * key space land in the same files, so parquet min/max stats prune most
  * files for selective multi-column predicates.
  *
  * Spark-first shape:
  *  1. per column, bucket values into 2^bits ranks via quantile boundaries
  *     estimated from a sample (driver holds only `2^bits` doubles — never
  *     the data);
  *  2. bit-interleave the bucket ids into one long z-value with plain
  *     Column arithmetic (codegen'd shifts/ors — no UDF);
  *  3. range-repartition + sort by z-value and write.
  *
  * The same z-value column also serves as a locality-preserving 1-D sort
  * key for block-wise nearest-neighbour sweeps.
  */
object Layout {

  /** Morton interleave of pre-bucketed non-negative int columns (each in
    * [0, 2^bits)): column i contributes its bit j to output bit
    * (j * n + i). Pure Column arithmetic so it stays inside whole-stage
    * codegen.
    */
  def interleaveBits(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n * bits <= 63, s"$n cols x $bits bits exceeds a long")
    val terms = for {
      (c, i) <- buckets.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rank-bucket a numeric column into [0, len(bounds)] given ascending
    * quantile boundaries: the bucket index is the count of boundaries the
    * value clears. Monotone in the column value; ties share a bucket; the
    * comparison chain stays codegen'd.
    */
  def rankBucket(colName: String, bounds: Array[Double]): Column =
    bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(colName) >= b, 1).otherwise(0)
    }

  /** Per-file column min/max from parquet footers — the statistics file
    * skipping actually uses, surfaced for layout validation (a Z-order
    * rewrite is only worth its shuffle if these ranges come out narrow).
    * Footer reads only — no data pages touched. Driver-side listing: this
    * is a diagnostic over a bounded file set; wrap in a Dataset of paths
    * to distribute at larger counts.
    */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
      colName: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    def asDouble(v: Any): Option[Double] = v match {
      case null => None
      case n: Number => Some(n.doubleValue())
      case other => scala.util.Try(other.toString.toDouble).toOption
    }
    val rows = files.toSeq.map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        // only chunks with usable stats: all-null row groups have no
        // min/max, string/binary columns have non-numeric ones — a layout
        // diagnostic reports those as null bounds instead of throwing
        val stats = blocks.flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == colName)
          .map(_.getStatistics)
          .filter(s => s != null && !s.isEmpty && s.hasNonNullValue)
        val mins = stats.flatMap(s => asDouble(s.genericGetMin))
        val maxs = stats.flatMap(s => asDouble(s.genericGetMax))
        val nRows = blocks.map(_.getRowCount).sum
        (f.getPath.getName, mins.minOption, maxs.maxOption, nRows)
      } finally reader.close()
    }
    import spark.implicits._
    rows.toDF("file", "min", "max", "n_rows")
  }

  /** Z-order `df` by `cols` into `numFiles` range-partitioned, internally
    * sorted partitions, ready for `.write.parquet`. `bits` per-column rank
    * resolution (default 8 → 256 ranks/col, plenty for file-level stats).
    * Boundary estimation is ONE sampled pass over all columns together
    * (approxQuantile multi-column form); driver-side state is
    * `cols.size * 2^bits` doubles regardless of data volume.
    */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 8, relErr: Double = 0.001): DataFrame = {
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val allBounds = df.stat.approxQuantile(cols.toArray, probs, relErr)
    val z = interleaveBits(
      cols.zip(allBounds).map { case (c, bounds) => rankBucket(c, bounds) }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
