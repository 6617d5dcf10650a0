package graft

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests: every codegen'd custom expression must equal its
  * pure-Column (higher-order-function) reference formulation on real
  * corpus text plus crafted edge cases.
  */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, TestSpark.sf0001).limit(100).cache()

  lazy val edge = Seq(
    "",                       // empty text
    "single",                 // one token
    "a b",                    // fewer tokens than shingle width
    "  leading and trailing  ",
    "the the the the the",    // all stopwords / repeated tokens
  ).toDF("text")

  test("simHash64 expression == HOF reference") {
    for (df <- Seq(docs.select($"text"), edge)) {
      val bad = df
        .select(TF.simHash64($"text").as("fast"), TF.simHash64Reference($"text").as("ref"))
        .filter($"fast" =!= $"ref")
        .count()
      assert(bad === 0)
    }
  }

  test("minHashSignature expression == HOF reference") {
    // reference needs non-empty shingles; shingles() always emits >= 1
    for (df <- Seq(docs.select($"text"), edge)) {
      val bad = df
        .select(
          TF.minHashSignature(TF.shingles($"text", 3), 16).as("fast"),
          TF.minHashSignatureReference(TF.shinglesReference($"text", 3), 16).as("ref"))
        .filter($"fast" =!= $"ref")
        .count()
      assert(bad === 0)
    }
  }

  test("portable minHash signature expression == HOF md5 reference") {
    for (df <- Seq(docs.select($"text"), edge)) {
      val bad = df
        .select(
          TF.minHashSignaturePortable(TF.shingles($"text", 3), 16).as("fast"),
          TF.minHashSignaturePortableReference(TF.shinglesReference($"text", 3), 16).as("ref"))
        .filter($"fast" =!= $"ref")
        .count()
      assert(bad === 0)
    }
  }

  test("shingles expression == HOF reference") {
    for (df <- Seq(docs.select($"text"), edge)) {
      val bad = df
        .select(TF.shingles($"text", 3).as("fast"), TF.shinglesReference($"text", 3).as("ref"))
        .filter($"fast" =!= $"ref")
        .count()
      assert(bad === 0)
    }
  }

  test("stopwordCount expression == HOF formulation") {
    for (df <- Seq(docs.select($"text"), edge)) {
      val bad = df
        .select(
          TF.stopwordCount($"text").as("fast"),
          size(filter(TF.tokens($"text"), t => t.isin(TF.stopwords: _*))).as("ref"))
        .filter($"fast" =!= $"ref")
        .count()
      assert(bad === 0)
    }
  }

  test("dot/l2Norm expressions == HOF reference on embeddings") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001).limit(50)
      .select(VF.asDouble($"embedding").as("v"))
    val paired = emb.crossJoin(emb.select($"v".as("w"))).limit(500)
    val bad = paired
      .select(
        VF.dot($"v", $"w").as("fast"),
        VF.dotReference($"v", $"w").as("ref"),
        VF.l2Norm($"v").as("nfast"),
        sqrt(VF.dotReference($"v", $"v")).as("nref"))
      .filter($"fast" =!= $"ref" || $"nfast" =!= $"nref")
      .count()
    assert(bad === 0)
  }

  test("jaccardSim == array_intersect/array_union formulation") {
    val t = docs.select(array_distinct(split($"text", "\\s+")).as("tok"))
    val pairs = t.crossJoin(t.select($"tok".as("tok2"))).limit(2000)
    val bad = pairs
      .select(
        graft.expressions.TokenExpressions.jaccardSim($"tok", $"tok2").as("fast"),
        (size(array_intersect($"tok", $"tok2")).cast("double") /
          size(array_union($"tok", $"tok2"))).as("ref"))
      .filter($"fast" =!= $"ref")
      .count()
    assert(bad === 0)
  }

  test("portable hex encoding: lexicographic order == unsigned numeric order") {
    // the portable MinHash min-tracks a bare unsigned long and emits
    // %016x — the whole scheme rests on hex order matching numeric order
    val rnd = new scala.util.Random(42)
    val samples = Array.fill(2000)(rnd.nextLong()) ++
      Array(0L, -1L, 1L, Long.MaxValue, Long.MinValue, Long.MinValue + 1)
    for (a <- samples.take(60); b <- samples.take(60)) {
      val (ha, hb) = (f"$a%016x", f"$b%016x")
      assert((ha < hb) === (java.lang.Long.compareUnsigned(a, b) < 0),
        s"$a vs $b: hex order diverged from unsigned order")
    }
  }

  test("portableHyperplaneBuckets: codegen == interpreted eval, scale-invariant") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001).limit(50)
      .select(VF.asDouble($"embedding").as("v")).cache()
    val viaDf = emb.select(VF.hyperplaneBucketsPortable($"v", 8, 4, 64).as("b"))
      .collect().map(_.getSeq[Long](0).toSeq)
    val expr = graft.expressions.VectorExpressions.PortableHyperplaneBuckets(
      org.apache.spark.sql.catalyst.expressions.Literal(1), 8, 4, 64)
    val viaEval = emb.collect().map { r =>
      expr.nullSafeEval(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(r.getSeq[Double](0).toArray))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    }
    assert(viaDf.toSeq === viaEval.toSeq)
    // positive scaling never flips a projection sign
    val scaled = emb.select(VF.hyperplaneBucketsPortable($"v", 8, 4, 64).as("b1"),
      VF.hyperplaneBucketsPortable(transform($"v", x => x * 2), 8, 4, 64).as("b2"))
      .filter($"b1" =!= $"b2").count()
    assert(scaled === 0)
  }

  test("hyperplaneBuckets: codegen == interpreted eval, deterministic, sign-symmetric") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001).limit(50)
      .select(VF.asDouble($"embedding").as("v")).cache()
    // codegen path (DataFrame) vs direct interpreted eval of the kernel
    val viaDf = emb.select(VF.hyperplaneBuckets($"v", 8, 4).as("b"))
      .collect().map(_.getSeq[Long](0).toSeq)
    val viaEval = emb.collect().map { r =>
      graft.expressions.VecOps.hyperplaneBuckets(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(r.getSeq[Double](0).toArray),
        8, 4).toLongArray().toSeq
    }
    assert(viaDf.toSeq === viaEval.toSeq)
    // deterministic across runs
    val again = emb.select(VF.hyperplaneBuckets($"v", 8, 4).as("b"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(viaDf.toSeq === again.toSeq)
    // v and 2v always share every bucket (scale-invariant signs)
    val scaled = emb.select(VF.hyperplaneBuckets($"v", 8, 4).as("b1"),
      VF.hyperplaneBuckets(transform($"v", x => x * 2), 8, 4).as("b2"))
      .filter($"b1" =!= $"b2").count()
    assert(scaled === 0)
  }

  test("fingerprint is deterministic and hamming64 is sane") {
    val fp1 = docs.select(TF.fingerprint($"text").as("fp")).collect().map(_.getLong(0))
    val fp2 = docs.select(TF.fingerprint($"text").as("fp")).collect().map(_.getLong(0))
    assert(fp1.sameElements(fp2))
    val d = spark.sql("SELECT 1").select(
      TF.hamming64(lit(0L), lit(-1L)).as("all"),
      TF.hamming64(lit(5L), lit(5L)).as("none")).head()
    assert(d.getAs[Number]("all").intValue === 64)
    assert(d.getAs[Number]("none").intValue === 0)
  }
}
