package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: GraftExtensions must expose the custom expressions to
  * spark.sql. Uses its own session (extensions are builder-time).
  */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate would silently reuse the shared test session and skip
  // builder-time extensions — use the live-session registration path
  // (same function builders as the SparkSessionExtensions class).
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    graft.plans.GraftExtensions.register(s)
    s
  }

  test("custom expressions callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  graft_simhash64(array('spark', 'catalyst')) AS sh,
        |  graft_minhash(array('a b c', 'b c d'), 4) AS mh,
        |  graft_shingles(array('a', 'b', 'c'), 2) AS sg,
        |  graft_token_set_count(array('the', 'fox', 'the'), array('the', 'a')) AS tc,
        |  graft_jaccard(array('a', 'b'), array('b', 'c')) AS j,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  graft_l2norm(array(3.0d, 4.0d)) AS n
        |""".stripMargin).head()
    assert(r.getAs[Seq[Long]]("mh").length === 4)
    assert(r.getAs[Seq[String]]("sg") === Seq("a b", "b c"))
    assert(r.getAs[Int]("tc") === 2)
    assert(math.abs(r.getAs[Double]("j") - 1.0 / 3) < 1e-12)
    assert(r.getAs[Double]("d") === 11.0)
    assert(r.getAs[Double]("n") === 5.0)
  }

  test("SQL results match the Column API") {
    import spark.implicits._
    val viaSql = spark.sql("SELECT graft_simhash64(array('x','y','z')) AS v").head().getLong(0)
    val viaCol = Seq("x y z").toDF("t")
      .select(graft.functions.TextFunctions.simHash64($"t")).head().getLong(0)
    assert(viaSql === viaCol)
  }

  test("portable twins callable from SQL, consistent with the Column API") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT
        |  graft_minhash_portable(array('a b c', 'b c d'), 4) AS mh,
        |  graft_simhash64_portable(array('x', 'y', 'z')) AS sh,
        |  graft_hyperplane_buckets_portable(array(1.0d, -2.0d), 8, 16, 2) AS hb
        |""".stripMargin).head()
    assert(r.getAs[Seq[String]]("mh").length === 4)
    assert(r.getAs[Seq[String]]("mh").forall(_.matches("[0-9a-f]{16}")))
    assert(r.getAs[Seq[Long]]("hb").length === 16)
    val viaCol = Seq("x y z").toDF("t")
      .select(graft.functions.TextFunctions.simHash64Portable($"t")).head().getLong(0)
    assert(r.getAs[Long]("sh") === viaCol)
  }
}
