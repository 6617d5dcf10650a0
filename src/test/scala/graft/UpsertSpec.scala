package graft

import graft.io.Upsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsert replaces colliding keys and appends new ones") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val out = Upsert.upsert(target, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out === Map(
      1L -> ("a", 10.0), 2L -> ("B", 99.0), 3L -> ("c", 30.0), 4L -> ("d", 40.0)))
  }

  test("partitioned upsert rewrites only affected partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/table"
    Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0), (4L, "p3", 4.0))
      .toDF("k", "part", "v")
      .write.partitionBy("part").parquet(dir)

    def files(p: String) = new java.io.File(s"$dir/part=$p").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val p2Before = files("p2")
    val p3Before = files("p3")

    // updates touch p1 (replace k=2) and p3 (new key) — p2 must be inert
    val updates = Seq((2L, "p1", 22.0), (5L, "p3", 5.0)).toDF("k", "part", "v")
    Upsert.upsertPartitioned(spark, dir, updates, Seq("k"), "part")

    val out = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    assert(out === Map(1L -> 1.0, 2L -> 22.0, 3L -> 3.0, 4L -> 4.0, 5L -> 5.0))
    assert(files("p2") === p2Before, "untouched partition was rewritten")
    assert(files("p3") !== p3Before, "affected partition should be rewritten")
  }

  test("partitioned upsert handles a key that MOVES partition (no stale duplicate)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_mv").toString + "/table"
    Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0))
      .toDF("k", "part", "v")
      .write.partitionBy("part").parquet(dir)

    // k=2 moves p1 -> p2: its old p1 row must be rewritten away even though
    // no update row names p1
    val updates = Seq((2L, "p2", 22.0)).toDF("k", "part", "v")
    Upsert.upsertPartitioned(spark, dir, updates, Seq("k"), "part")

    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("part"), r.getAs[Double]("v")))
    assert(rows.count(_._1 == 2L) === 1, s"stale duplicate after move: ${rows.toSeq}")
    assert(rows.toSet === Set((1L, "p1", 1.0), (2L, "p2", 22.0), (3L, "p2", 3.0)))
  }

  test("key move that EMPTIES its old partition leaves no stale files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_empty").toString + "/table"
    // p1 holds ONLY k=2 — after the move the merged output contains no p1
    // rows, so dynamic overwrite alone would keep p1's old file
    Seq((1L, "p0", 1.0), (2L, "p1", 2.0)).toDF("k", "part", "v")
      .write.partitionBy("part").parquet(dir)
    val updates = Seq((2L, "p2", 22.0)).toDF("k", "part", "v")
    Upsert.upsertPartitioned(spark, dir, updates, Seq("k"), "part")
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("part"), r.getAs[Double]("v")))
    assert(rows.toSet === Set((1L, "p0", 1.0), (2L, "p2", 22.0)),
      s"stale row survived in the emptied partition: ${rows.toSeq}")
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(s"$dir/part=p1")),
      "emptied partition directory must be removed")
  }

  test("emptied-partition cleanup survives timestamp partition values") {
    // fractional-second timestamps render differently under JVM toString
    // ("2024-01-01 00:00:00.123") vs the writer's partition path — the
    // cleanup must find the stale directory by listing, not reconstruction
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_ts").toString + "/table"
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00.123")
    val t2 = java.sql.Timestamp.valueOf("2024-06-01 12:30:45.5")
    Seq((1L, t1, 1.0), (2L, t2, 2.0)).toDF("k", "part", "v")
      .write.partitionBy("part").parquet(dir)
    // k=1 moves t1 -> t2: t1's partition is emptied and must vanish
    val updates = Seq((1L, t2, 11.0)).toDF("k", "part", "v")
    Upsert.upsertPartitioned(spark, dir, updates, Seq("k"), "part")
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[java.sql.Timestamp]("part"), r.getAs[Double]("v")))
    assert(rows.toSet === Set((1L, t2, 11.0), (2L, t2, 2.0)))
    val staleDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("part="))
    assert(staleDirs.length === 1,
      s"emptied timestamp partition dir survived: ${staleDirs.map(_.getName).toSeq}")
  }

  test("assumeStablePartitions skips the old-location scan (stable keys only)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_st").toString + "/table"
    Seq((1L, "p1", 1.0), (2L, "p2", 2.0)).toDF("k", "part", "v")
      .write.partitionBy("part").parquet(dir)
    val updates = Seq((2L, "p2", 22.0)).toDF("k", "part", "v")
    Upsert.upsertPartitioned(spark, dir, updates, Seq("k"), "part",
      assumeStablePartitions = true)
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    assert(out === Map(1L -> 1.0, 2L -> 22.0))
  }

  test("hll sketches are mergeable: per-source union == direct estimate, near exact") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val direct = docs.agg(
      hll_sketch_estimate(hll_sketch_agg(col("doc_id"))).as("est"),
      countDistinct(col("doc_id")).as("exact")).head()
    val merged = docs
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("doc_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).head()
    val exact = direct.getAs[Long]("exact").toDouble
    assert(math.abs(direct.getAs[Long]("est") - exact) / exact < 0.05)
    // the two-level merge is a sketch union (not bit-identical to the
    // single-pass sketch) — it must stay within the same error envelope
    assert(math.abs(merged.getAs[Long]("est") - exact) / exact < 0.05)
  }
}
