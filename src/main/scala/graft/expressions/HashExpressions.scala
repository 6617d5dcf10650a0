package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hash-sketch operators.
  *
  * The pure-`Column` formulations in TextFunctions are semantically exact
  * but ride Spark's higher-order functions (`aggregate`/`zip_with`/
  * `transform`), which are interpreted per element and allocate
  * intermediate arrays per token — measured 137 s for SimHash over 5k docs
  * at sf0.1. These expressions compute the identical values (same
  * xxhash64, seed 42, same bit semantics — asserted by differential tests
  * in ExpressionSpec) in a single tight loop per row, with full codegen so
  * the surrounding projection stays one whole-stage span.
  *
  * Scale: per-row, no state, no shuffle — linear in tokens, arbitrarily
  * partitionable.
  */
object HashExpressions {

  private val SEED = 42L // Spark's fixed xxhash64 seed
  private val XXH = classOf[XXH64].getName.stripSuffix("$")

  /** SimHash64 over an array<string> of tokens: per token take
    * xxhash64(token), add ±1 votes per bit, emit the sign bitmap.
    * Matches TextFunctions.simHash64Reference bit-for-bit.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = XXH64.hashUTF8String(arr.getUTF8String(i), SEED)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) out |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val votes = ctx.addMutableState("int[]", "simhashVotes",
          v => s"$v = new int[64];")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val out = ctx.freshName("out")
        s"""
           |java.util.Arrays.fill($votes, 0);
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  if (!$a.isNullAt($i)) {
           |    long $h = $XXH.hashUTF8String($a.getUTF8String($i), ${SEED}L);
           |    for (int $b = 0; $b < 64; $b++) {
           |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
           |    }
           |  }
           |}
           |long $out = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($votes[$b] > 0) $out |= (1L << $b);
           |}
           |${ev.value} = $out;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** MinHash signature over an array<string> of shingles: sig(i) =
    * min over shingles of xxhash64(i, shingle) — the seed chain matches
    * Spark's multi-argument xxhash64 (hashInt(i, 42) then hashUTF8String
    * with the running hash as seed), so it equals
    * TextFunctions.minHashSignatureReference exactly.
    */
  case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val seeds: Array[Long] =
      Array.tabulate(k)(i => XXH64.hashInt(i, SEED))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val sig = Array.fill(k)(Long.MaxValue)
      var s = 0
      val n = arr.numElements()
      while (s < n) {
        if (!arr.isNullAt(s)) {
          val str = arr.getUTF8String(s)
          var i = 0
          while (i < k) {
            val h = XXH64.hashUTF8String(str, seeds(i))
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        }
        s += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
        val sig = ctx.freshName("sig")
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        val str = ctx.freshName("str")
        s"""
           |long[] $sig = new long[$k];
           |java.util.Arrays.fill($sig, Long.MAX_VALUE);
           |for (int $s = 0; $s < $a.numElements(); $s++) {
           |  if (!$a.isNullAt($s)) {
           |    org.apache.spark.unsafe.types.UTF8String $str = $a.getUTF8String($s);
           |    for (int $i = 0; $i < $k; $i++) {
           |      long $h = $XXH.hashUTF8String($str, $seedsRef[$i]);
           |      if ($h < $sig[$i]) $sig[$i] = $h;
           |    }
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  def minhashSignature(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), k))
}
