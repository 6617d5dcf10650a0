package graft

import graft.io.ResultStore
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class ResultStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("append runs + monotone watermark, advanced only after success") {
    val base = Files.createTempDirectory("graft_store").toString
    ResultStore.appendRun(Seq((1, "a")).toDF("k", "v"), base, 100L)
    ResultStore.appendRun(Seq((2, "b")).toDF("k", "v"), base, 200L)
    assert(ResultStore.pendingRuns(base) === Seq(100L, 200L))

    // failing consumer must NOT advance the watermark
    intercept[RuntimeException] {
      ResultStore.loadNewRuns(spark, base)(_ => throw new RuntimeException("sink down"))
    }
    assert(ResultStore.readWatermark(base) === Long.MinValue)
    assert(ResultStore.pendingRuns(base) === Seq(100L, 200L))

    // successful load consumes both and advances
    var seen = 0L
    val loaded = ResultStore.loadNewRuns(spark, base)(df => seen = df.count())
    assert(loaded === Seq(100L, 200L) && seen === 2)
    assert(ResultStore.readWatermark(base) === 200L)

    // nothing pending now; a new run is picked up incrementally
    assert(ResultStore.loadNewRuns(spark, base)(_ => ()) === Seq.empty)
    ResultStore.appendRun(Seq((3, "c")).toDF("k", "v"), base, 300L)
    assert(ResultStore.loadNewRuns(spark, base)(df => seen = df.count()) === Seq(300L))
    assert(seen === 1)
  }

  test("exactly-once per run id: duplicate append fails") {
    val base = Files.createTempDirectory("graft_store2").toString
    ResultStore.appendRun(Seq((1, "a")).toDF("k", "v"), base, 1L)
    intercept[Exception] {
      ResultStore.appendRun(Seq((9, "z")).toDF("k", "v"), base, 1L)
    }
    var n = 0L
    ResultStore.loadNewRuns(spark, base)(df => n = df.count())
    assert(n === 1)
  }

  test("overwrite dialect is a full refresh") {
    val p = Files.createTempDirectory("graft_ow").toString + "/t"
    ResultStore.overwrite(Seq(1, 2, 3).toDF("x"), p)
    ResultStore.overwrite(Seq(9).toDF("x"), p)
    assert(spark.read.parquet(p).count() === 1)
  }
}
