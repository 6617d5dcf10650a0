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

  /** Engine-portable MinHash signature: sig(i) = the first 16 hex chars of
    * md5("<i>:" ++ shingle), minimized over shingles. The first 16 hex
    * chars of an md5 are its first 8 digest bytes read big-endian as an
    * unsigned 64-bit value, so the loop tracks a bare long per seed
    * (Long.compareUnsigned) and hex-formats once at the end — no string
    * churn inside the hot loop. Equals
    * TextFunctions.minHashSignaturePortableReference element-for-element
    * (differential-tested in ExpressionSpec) and is replayed by the DuckDB
    * oracles of q45/q68 via `substr(md5(i || ':' || sh), 1, 16)`.
    */
  case class PortableMinHashSignature(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any =
      PortableMinhashOps.signature(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = graft.expressions.PortableMinhashOps.signature($a, $k);"
      })

    override protected def withNewChildInternal(newChild: Expression): PortableMinHashSignature =
      copy(child = newChild)
  }

  /** Engine-portable SimHash64: identical vote/bitmap semantics to
    * [[SimHash64]], but the per-token hash is the first 8 md5 bytes read
    * big-endian — the value any engine reproduces as
    * `('0x' || substr(md5(token), 1, 16))::UBIGINT` (the q46 DuckDB oracle
    * does exactly that).
    */
  case class PortableSimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        PortableMinhashOps.simhash(input.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = graft.expressions.PortableMinhashOps.simhash($a);"
      })

    override protected def withNewChildInternal(newChild: Expression): PortableSimHash64 =
      copy(child = newChild)
  }

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  def portableSimhash64(tokens: Column): Column =
    Bridge.column(PortableSimHash64(Bridge.expression(tokens)))

  def minhashSignature(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), k))

  def portableMinhashSignature(shingles: Column, k: Int): Column =
    Bridge.column(PortableMinHashSignature(Bridge.expression(shingles), k))
}

/** Top-level on purpose: generated (Janino) code calls the static
  * forwarder `graft.expressions.PortableMinhashOps.signature`, which scalac
  * only emits for top-level objects (nested-object statics don't link and
  * silently drop the stage to interpreted).
  */
object PortableMinhashOps {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // "<i>:" prefix bytes per seed index, cached per distinct k
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      n => Array.tabulate(n)(i => s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** First 8 md5 bytes of the UTF-8 string, big-endian — the 64-bit value
    * `('0x' || substr(md5(s), 1, 16))::UBIGINT` in any md5-capable engine.
    */
  def hash64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digests.get()
    val out = new Array[Byte](16)
    md.reset()
    md.update(s.getBytes)
    md.digest(out, 0, 16)
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (out(b) & 0xffL); b += 1 }
    h
  }

  /** SimHash64 with [[hash64]] as the token hash: per token ±1 votes per
    * bit, bit set iff the vote is positive — the same semantics as the
    * xxhash64-native kernel.
    */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
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
    out
  }

  /** sig(i) = min over shingles of the first 8 md5 bytes of "<i>:"+shingle,
    * as an unsigned long; emitted as the 16-lowercase-hex string whose
    * lexicographic order equals the unsigned numeric order.
    */
  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val pre = prefixes(k)
    val md = digests.get()
    val out = new Array[Byte](16)
    // unsigned min; MaxValue pattern only survives an empty shingle array,
    // where the signature row is all-ff — same degenerate value every engine
    // computes for "no shingles", never compared against real corpora
    val sig = Array.fill(k)(-1L) // 0xffffffffffffffff == unsigned max
    var s = 0
    val n = shingles.numElements()
    while (s < n) {
      if (!shingles.isNullAt(s)) {
        val bytes = shingles.getUTF8String(s).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(pre(i))
          md.update(bytes)
          md.digest(out, 0, 16)
          var h = 0L
          var b = 0
          while (b < 8) { h = (h << 8) | (out(b) & 0xffL); b += 1 }
          if (java.lang.Long.compareUnsigned(h, sig(i)) < 0) sig(i) = h
          i += 1
        }
      }
      s += 1
    }
    val strs: Array[AnyRef] = Array.tabulate(k) { i =>
      org.apache.spark.unsafe.types.UTF8String.fromString(f"${sig(i)}%016x")
    }
    new GenericArrayData(strs)
  }
}
