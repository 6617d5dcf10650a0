package graft

import graft.ml.RidgePipeline
import org.scalatest.funsuite.AnyFunSuite

class MlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ridge pipeline trains, metrics within tolerance bands") {
    val t = RidgePipeline.train(spark, Tables.lineitem(spark, TestSpark.sf0001),
      Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
    val m = t.metrics.head()
    val nTrain = m.getAs[Long]("n_train")
    val nTest = m.getAs[Long]("n_test")
    // SURVEY §7.4: assert ratios, never exact counts
    val ratio = nTrain.toDouble / (nTrain + nTest)
    assert(ratio > 0.75 && ratio < 0.85, s"split ratio $ratio")
    assert(m.getAs[Double]("rmse") > 0)
    assert(m.getAs[Double]("r2") <= 1.0)
    assert(m.getAs[String]("coefficients").split(",").length === 3)
  }

  test("model persists and reloads with identical predictions (§2.1 model sink)") {
    val t = RidgePipeline.train(spark, Tables.lineitem(spark, TestSpark.sf0001),
      Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString + "/model"
    t.model.write.overwrite().save(dir)
    val reloaded = org.apache.spark.ml.PipelineModel.load(dir)
    val sample = Tables.lineitem(spark, TestSpark.sf0001).limit(100)
    val p1 = t.model.transform(sample).select("prediction").collect().map(_.getDouble(0))
    val p2 = reloaded.transform(sample).select("prediction").collect().map(_.getDouble(0))
    assert(p1.sameElements(p2))
  }

  test("grid prediction is deterministic and filtered") {
    val t = RidgePipeline.train(spark, Tables.lineitem(spark, TestSpark.sf0001),
      Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
    val grids = Seq(
      "l_quantity" -> (0 to 40 by 10).map(_.toDouble),
      "l_discount" -> Seq(0.0, 0.05, 0.1),
      "l_tax" -> Seq(0.0, 0.04, 0.08))
    val p1 = RidgePipeline.predictGrid(spark, t.model, grids, maxPrediction = 1e9)
    assert(p1.count() === 5 * 3 * 3)
    val p2 = RidgePipeline.predictGrid(spark, t.model, grids, maxPrediction = 1e9)
    assert(p1.collect().map(_.toSeq).toSeq === p2.collect().map(_.toSeq).toSeq)
  }

  test("recommendation rank: rank 1 = lowest prediction, feasibility tie-break") {
    import org.apache.spark.sql.functions.col
    val t = RidgePipeline.train(spark, Tables.lineitem(spark, TestSpark.sf0001),
      Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
    val grids = Seq(
      "l_quantity" -> (0 to 40 by 10).map(_.toDouble),
      "l_discount" -> Seq(0.0, 0.05, 0.1),
      "l_tax" -> Seq(0.0, 0.04, 0.08))
    val ranked = RidgePipeline.predictGrid(spark, t.model, grids,
      maxPrediction = 1e9,
      feasibility = Some(RidgePipeline.feasibilityScore(
        col("l_quantity"), col("l_discount"), col("l_tax")))).collect()
    assert(ranked.map(_.getAs[Int]("recommendation_rank")).toSeq ===
      (1 to ranked.length))
    // rank 1 carries the global minimum prediction
    val minPred = ranked.map(_.getAs[Double]("prediction")).min
    assert(ranked.head.getAs[Double]("prediction") === minPred)
    // among min-prediction rows, rank 1 has the best feasibility
    val tied = ranked.filter(_.getAs[Double]("prediction") == minPred)
    assert(ranked.head.getAs[Double]("feasibility_score") ===
      tied.map(_.getAs[Double]("feasibility_score")).max)
  }

  test("feasibilityScore matches the reference's piecewise formula") {
    import org.apache.spark.sql.functions.lit
    def score(p: Double, s: Double, w: Double): Double =
      spark.range(1).select(RidgePipeline.feasibilityScore(
        lit(p), lit(s), lit(w)).as("f")).head().getDouble(0)
    assert(score(5, 6, 10) === 100.0)          // no penalties
    assert(score(12, 6, 10) === 98.0)          // mid precip: -(12-10)*1
    assert(score(20, 6, 10) === 90.0)          // high precip: -(20-15)*2
    assert(score(5, 1, 10) === 90.0)           // low sun: -(3-1)*5
    assert(score(5, 6, 25) === 85.0)           // high wind: -(25-20)*3
    assert(score(5, 6, 4) === 92.0)            // low wind: -(8-4)*2
    assert(score(40, 0, 60) === 0.0)           // clamped at 0
  }
}
