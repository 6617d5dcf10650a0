package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's MLlib surface (SURVEY.md §2.10) re-expressed generically:
  * VectorAssembler → StandardScaler(withMean, withStd) → ridge
  * LinearRegression (maxIter=100, regParam=0.1, elasticNetParam=0.0),
  * randomSplit([0.8, 0.2], seed=42), RMSE/R²/MAE evaluation, coefficient
  * extraction — mirroring `/root/reference/src/spark_mllib/train_et_model.py:313-436`.
  *
  * Per SURVEY §7.4: randomSplit row counts are partitioning-dependent, so
  * tests assert ratio/metric tolerances and coefficient signs, never exact
  * counts.
  */
object RidgePipeline {

  case class TrainedModel(
      model: org.apache.spark.ml.PipelineModel,
      metrics: DataFrame)

  /** Closed-form single-feature ridge regression (intercept unpenalized):
    * slope = Sxy / (Sxx + λ) over centered data, computed from the
    * numerically stable covar_pop/var_pop aggregates — one pass, one row
    * out, no iterative solver. mse follows without a second data pass:
    * with a = ȳ − b·x̄, residual = (y−ȳ) − b(x−x̄), so
    * mse = var_y − 2b·covar + b²·var_x. Every quantity is a standard SQL
    * aggregate, which makes this the ORACLE-CHECKED twin of the seeded
    * MLlib pipeline in [[train]] (q60 stays rows-only; q109 hash-checks
    * this one end to end against DuckDB).
    *
    * Output row: (n, slope, intercept, rmse, r2) — rounded for
    * cross-engine float parity.
    */
  def closedFormSimpleRidge(df: DataFrame, xCol: String, yCol: String,
      lambda: Double): DataFrame = {
    require(lambda >= 0, "need lambda >= 0")
    val pr = graft.functions.ColumnFunctions.pround _
    val stats = df
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("x")).as("ax"), avg(col("y")).as("ay"),
        covar_pop(col("x"), col("y")).as("cxy"),
        var_pop(col("x")).as("vx"), var_pop(col("y")).as("vy"))
    val slope = col("cxy") / (col("vx") + lit(lambda) / col("n"))
    // clamped at 0: floating-point cancellation in vy − 2b·cxy + b²·vx can
    // land epsilon-negative on a near-perfect fit, and sqrt of that is NaN
    val mse = greatest(
      col("vy") - lit(2.0) * slope * col("cxy") + slope * slope * col("vx"),
      lit(0.0))
    stats.select(
      col("n"),
      pr(slope, 4).as("slope"),
      pr(col("ay") - slope * col("ax"), 4).as("intercept"),
      pr(sqrt(mse), 4).as("rmse"),
      // r² is undefined when y is constant (vy = 0) — null, not a 0/0 NaN
      when(col("vy") === 0, lit(null).cast("double"))
        .otherwise(pr(lit(1.0) - mse / col("vy"), 6)).as("r2"))
  }

  /** Train on `df` with the reference's hyperparameters; returns the fitted
    * pipeline and a one-row metrics DataFrame (the `ml_model_performance`
    * table shape: counts, rmse/r2/mae, intercept, coefficients).
    */
  def train(spark: SparkSession, df: DataFrame, featureCols: Seq[String],
      labelCol: String): TrainedModel = {
    // project to the model columns FIRST: the cache below materializes its
    // input as-is (no column pruning through a cache), so caching the full
    // table would store every column for a 4-column model
    val modelCols = featureCols :+ labelCol
    val clean = df.select(modelCols.map(org.apache.spark.sql.functions.col): _*)
      .na.drop(modelCols)

    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features_raw")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    // elasticNetParam=0 (pure ridge) admits the closed-form normal-equation
    // solver — one corpus pass instead of up to maxIter L-BFGS passes;
    // maxIter kept for hyperparameter parity with the reference but unused
    val lr = new LinearRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setMaxIter(100).setRegParam(0.1).setElasticNetParam(0.0)
      .setSolver("normal")

    // Fixed partition count before the split: randomSplit assigns rows per
    // partition, so this pins reproducibility across input layouts. Cached
    // so the two split branches don't each re-scan and re-shuffle the input.
    // Only `base` is cached: the split branches are narrow per-partition
    // samples over it, cheap to recompute — separate caches for train/test
    // would triple the materialized bytes for no saved work.
    val base = clean.repartition(8).cache()
    val Array(train, test) = base.randomSplit(Array(0.8, 0.2), seed = 42)

    val model = new Pipeline().setStages(Array(assembler, scaler, lr)).fit(train)
    val predictions = model.transform(test).cache()

    def eval(metric: String): Double = new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
      .setMetricName(metric).evaluate(predictions)

    val lrModel = model.stages.last.asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    val coefs = lrModel.coefficients.toArray

    import spark.implicits._
    val metrics = Seq((
      train.count(), test.count(),
      math.rint(eval("rmse") * 1e4) / 1e4,
      math.rint(eval("r2") * 1e4) / 1e4,
      math.rint(eval("mae") * 1e4) / 1e4,
      math.rint(lrModel.intercept * 1e4) / 1e4,
      coefs.map(c => math.rint(c * 1e4) / 1e4).mkString(","),
    )).toDF("n_train", "n_test", "rmse", "r2", "mae", "intercept", "coefficients")
    metrics.count() // materialize before releasing the cached inputs
    base.unpersist(); predictions.unpersist()
    TrainedModel(model, metrics)
  }

  /** Scenario-feasibility score (0–100) mirroring the reference's
    * `calculate_feasibility_score` (predict_et_model.py:169-197): piecewise
    * penalties for high precipitation, low sunshine, and extreme wind,
    * clamped to [0, 100]. Pure Column arithmetic — evaluated per scenario
    * row, no driver loop.
    */
  def feasibilityScore(precip: org.apache.spark.sql.Column,
      sunshine: org.apache.spark.sql.Column,
      wind: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val precipPenalty = when(precip > 15, (precip - 15) * 2)
      .when(precip > 10, precip - 10).otherwise(lit(0.0))
    val sunPenalty = when(sunshine < 3, (lit(3.0) - sunshine) * 5).otherwise(lit(0.0))
    val windPenalty = when(wind > 20, (wind - 20) * 3)
      .when(wind < 8, (lit(8.0) - wind) * 2).otherwise(lit(0.0))
    greatest(lit(0.0), least(lit(100.0),
      lit(100.0) - precipPenalty - sunPenalty - windPenalty))
  }

  /** Scenario-grid batch inference (predict_et_model.py:279-380 shape):
    * cross-join of value ranges → model.transform → threshold filter →
    * recommendation ranking. `feasibility` (optional) is the reference's
    * tie-breaker: rank = row_number over (prediction ASC, feasibility
    * DESC, grid columns ASC) — rank 1 is the recommended scenario ("best
    * scenario" deliverable, ASSIGNMENT_ASSESSMENT.md:403-418). The global
    * window is safe here: the scenario grid is generated and bounded (it
    * never scales with the corpus).
    */
  def predictGrid(spark: SparkSession, model: org.apache.spark.ml.PipelineModel,
      grids: Seq[(String, Seq[Double])], maxPrediction: Double,
      feasibility: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val gridDf = grids.map { case (name, values) => values.toDF(name) }
      .reduce(_.crossJoin(_))
    val scored = model.transform(gridDf)
      .filter(col("prediction") < maxPrediction)
      .withColumn("prediction", round(col("prediction"), 4))
      .withColumn("feasibility_score",
        feasibility.getOrElse(lit(100.0)))
    val order = col("prediction").asc +: col("feasibility_score").desc +:
      grids.map(g => col(g._1).asc)
    scored
      .withColumn("recommendation_rank",
        row_number().over(Window.orderBy(order: _*)))
      .orderBy(col("recommendation_rank"))
  }
}
