package graft

import graft.io.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("interleaveBits: quadrant prefixes order correctly and are invertible-disjoint") {
    import spark.implicits._
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (255, 255), (128, 0), (0, 128))
      .toDF("x", "y")
      .withColumn("z", Layout.interleaveBits(Seq(col("x"), col("y")), 8))
    val z = df.select("x", "y", "z").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(z((0, 0)) === 0L)
    assert(z((1, 0)) === 1L)   // x occupies even bit positions
    assert(z((0, 1)) === 2L)   // y the odd ones
    assert(z((1, 1)) === 3L)
    assert(z((255, 255)) === 65535L)
    // top-bit quadrant dominates: any (>=128, _) z is above any (<128, <128) z
    assert(z((128, 0)) > z((1, 1)))
    assert(z.values.toSeq.distinct.size === z.size)
  }

  test("zorderBy clusters a 2-D box predicate into a minority of files") {
    import spark.implicits._
    val n = 4096
    // two independent uniform dims — the layout worst case for 1-D sorting
    val df = (0 until n)
      .map(i => (i * 2654435761L % n, i * 40503L % n))
      .toDF("x", "y")
      .withColumn("x", col("x").cast("double"))
      .withColumn("y", col("y").cast("double"))

    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val files = 16
    Layout.zorderBy(df, Seq("x", "y"), files, bits = 8)
      .write.mode("overwrite").parquet(dir)

    val read = spark.read.parquet(dir)
    assert(read.count() === n)

    // a box covering 1/16 of each dim = 1/256 of the space: with z-order
    // the matching rows sit in O(1) files; a 1-D x-sort would match every
    // y stripe and a random layout every file
    val box = read.filter(col("x") < n / 16 && col("y") < n / 16)
      .select(input_file_name()).distinct().count()
    assert(box <= files / 2, s"box predicate touched $box of $files files")
  }

  test("fileStats: z-ordered files carry narrow per-file ranges in BOTH dims") {
    import spark.implicits._
    val n = 4096
    val df = (0 until n)
      .map(i => (i * 2654435761L % n, i * 40503L % n))
      .toDF("x", "y")
      .withColumn("x", col("x").cast("double"))
      .withColumn("y", col("y").cast("double"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zstats").toString + "/t"
    graft.io.Layout.zorderBy(df, Seq("x", "y"), 16, bits = 8)
      .write.parquet(dir)
    for (c <- Seq("x", "y")) {
      val stats = graft.io.Layout.fileStats(spark, dir, c)
        .withColumn("span", col("max") - col("min"))
      val avgSpan = stats.agg(avg("span")).head().getDouble(0)
      // 16 z-files over 2 dims ≈ 4×4 grid → ~1/4 of each dim per file;
      // any 1-D-sorted or random layout leaves the non-sort dim at ~full span
      assert(avgSpan < n * 0.55, s"$c avg per-file span $avgSpan of $n")
    }
  }

  test("fileStats reports null bounds for all-null and string columns instead of throwing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString + "/t"
    Seq((None: Option[Double], "abc"), (None, "xyz"))
      .toDF("allnull", "s").coalesce(1).write.parquet(dir)
    val nullStats = Layout.fileStats(spark, dir, "allnull").collect()
    assert(nullStats.length === 1 && nullStats.head.isNullAt(1) && nullStats.head.isNullAt(2))
    // string column: non-numeric min/max -> null bounds, no exception
    val strStats = Layout.fileStats(spark, dir, "s").collect()
    assert(strStats.length === 1 && strStats.head.isNullAt(1))
    // column absent from the file entirely -> null bounds
    val absent = Layout.fileStats(spark, dir, "no_such_col").collect()
    assert(absent.length === 1 && absent.head.isNullAt(1))
  }

  test("zorderBy preserves every row exactly once") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toDouble, (999 - i).toDouble)).toDF("a", "b")
    val out = Layout.zorderBy(df, Seq("a", "b"), 4, bits = 4)
    assert(out.count() === 1000)
    assert(out.select(sum("a")).head().getDouble(0) === df.select(sum("a")).head().getDouble(0))
  }
}
