package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Codegen'd vector math over `array<double>` embedding columns.
  *
  * The zip_with/aggregate formulations in VectorFunctions are the readable
  * reference semantics, but Spark's higher-order functions are interpreted
  * per element — at 2M candidate pairs × 64 dims (q49 at sf0.1) that
  * measured 33 s. These expressions produce bit-identical doubles (same
  * left-to-right accumulation order) with a generated tight loop, and are
  * the building block for the norm-precomputed cosine in
  * [[graft.operators.Similarity]]: dot(a,b)/(norm_a*norm_b) where norms are
  * computed once per vector, not once per pair.
  *
  * Null array elements contribute 0 (the corpus has none; the HOF version
  * would return null for the whole row instead).
  */
object VectorExpressions {

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** sqrt(Σ x²) — sequential accumulation, same order as the HOF version. */
  case class L2Norm(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (!x.isNullAt(i)) { val v = x.getDouble(i); acc += v * v }
        i += 1
      }
      java.lang.Double.valueOf(math.sqrt(acc))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i)) {
           |    double $v = $a.getDouble($i);
           |    $acc += $v * $v;
           |  }
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): L2Norm =
      copy(child = newChild)
  }

  /** `tables` independent random-hyperplane sign signatures (Charikar 2002)
    * of `bitsPerTable` bits each, one long bucket id per table — the
    * OR-of-AND (banded) LSH family for cosine radius search: a pair is a
    * candidate if it collides in ANY table. Hyperplane coefficient
    * (table, bit, dim) is a splitmix64-derived uniform in [-0.5, 0.5) —
    * deterministic, public construction, no stored model. Both the
    * interpreted and generated paths call the single top-level
    * [[VecOps.hyperplaneBuckets]] kernel, so they cannot diverge.
    */
  case class HyperplaneBuckets(child: Expression, bitsPerTable: Int, tables: Int)
      extends UnaryExpression {
    require(bitsPerTable >= 1 && bitsPerTable <= 63 && tables >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(input: Any): Any =
      VecOps.hyperplaneBuckets(input.asInstanceOf[ArrayData], bitsPerTable, tables)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        // VecOps is TOP-LEVEL: scalac emits a static forwarder Janino can
        // link (nested objects have none — see JaccardOps)
        s"${ev.value} = ${VecOps.getClass.getName.stripSuffix("$")}" +
          s".hyperplaneBuckets($a, $bitsPerTable, $tables);")

    override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
      copy(child = newChild)
  }

  /** [[HyperplaneBuckets]] on the PORTABLE Rademacher planes ([[VecOps
    * .radSign]] of "t:b:d"): one tight loop over a precomputed ±1 table
    * instead of tables×bits wide Column dot products (which overflow the
    * whole-stage method budget and fall back to interpreted eval). Sign
    * test is `>= 0` to match the Column/SQL formulation.
    */
  case class PortableHyperplaneBuckets(child: Expression, bitsPerTable: Int,
      tables: Int, dim: Int) extends UnaryExpression {
    require(bitsPerTable >= 1 && bitsPerTable <= 63 && tables >= 1 && dim >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    // laid out [(t*bitsPerTable + b)*dim + d]
    @transient private lazy val planes: Array[Double] = {
      val out = new Array[Double](tables * bitsPerTable * dim)
      for (t <- 0 until tables; b <- 0 until bitsPerTable; d <- 0 until dim)
        out((t * bitsPerTable + b) * dim + d) = VecOps.radSign(s"$t:$b:$d")
      out
    }

    override def nullSafeEval(input: Any): Any =
      VecOps.portableBuckets(input.asInstanceOf[ArrayData], bitsPerTable, tables,
        dim, planes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("portablePlanes", planes, "double[]")
        s"${ev.value} = ${VecOps.getClass.getName.stripSuffix("$")}" +
          s".portableBuckets($a, $bitsPerTable, $tables, $dim, $ref);"
      })

    override protected def withNewChildInternal(newChild: Expression): PortableHyperplaneBuckets =
      copy(child = newChild)
  }

  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def l2Norm(v: Column): Column =
    Bridge.column(L2Norm(Bridge.expression(v)))

  def hyperplaneBuckets(v: Column, bitsPerTable: Int, tables: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(v), bitsPerTable, tables))

  def portableHyperplaneBuckets(v: Column, bitsPerTable: Int, tables: Int,
      dim: Int): Column =
    Bridge.column(PortableHyperplaneBuckets(Bridge.expression(v), bitsPerTable,
      tables, dim))
}

/** Top-level codegen kernel host (static-forwarder requirement — see
  * [[graft.expressions.JaccardOps]]).
  */
object VecOps {

  /** splitmix64 finalizer → uniform double in [-0.5, 0.5). */
  private def coef(table: Int, bit: Int, dim: Int): Double = {
    var z = (table.toLong << 42) ^ (bit.toLong << 24) ^ dim.toLong
    z += 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11) * (1.0 / (1L << 53)) - 0.5
  }

  /** One bucket id per table: bit b of table t set iff the projection of
    * the vector onto hyperplane (t, b) is positive. Null elements
    * contribute 0 (corpus has none — matches DotProduct's convention).
    */
  def hyperplaneBuckets(v: ArrayData, bitsPerTable: Int, tables: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        var proj = 0.0
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) proj += v.getDouble(i) * coef(t, b, i)
          i += 1
        }
        if (proj > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Portable Rademacher sign for a derivation key: +1 when the low bit of
    * the big-endian first-8-byte word of md5(key) is set (the value
    * `('0x' || substr(md5(key), 1, 16))::UBIGINT & 1` in any engine),
    * else −1. Shared by the Column-level hyperplane builders and the
    * codegen kernel so the two derivations cannot drift.
    */
  def radSign(key: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((h(7) & 1) == 1) 1.0 else -1.0
  }

  /** Portable multi-table buckets over a precomputed ±1 plane table laid
    * out [(t*bits + b)*dim + d]; sign test `>= 0`, sequential summation —
    * engine-exact vs the SQL `list_dot_product(...) >= 0` formulation.
    */
  def portableBuckets(v: ArrayData, bitsPerTable: Int, tables: Int, dim: Int,
      planes: Array[Double]): ArrayData = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * dim
        var proj = 0.0
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) proj += v.getDouble(i) * planes(base + i)
          i += 1
        }
        if (proj >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
