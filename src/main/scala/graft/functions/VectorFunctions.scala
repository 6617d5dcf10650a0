package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as pure `Column` combinators over `array<double>`
  * (`zip_with` + `aggregate` — codegen'd, no UDF, no shuffle). Input float32
  * arrays should be cast once via [[asDouble]] so all engines (and the
  * DuckDB oracle) accumulate in float64.
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential left-to-right dot product — same accumulation order as
    * DuckDB's list aggregates, so results agree bit-for-bit modulo the
    * final rounding. Delegates to the codegen'd expression; [[dotReference]]
    * is the interpreted HOF twin for differential tests.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotProduct(a, b)

  def dotReference(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = graft.expressions.VectorExpressions.l2Norm(v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared euclidean distance (cheaper than sqrt when only ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x,
    )

  /** Random-hyperplane LSH bucket id (Charikar 2002): sign-bit signature of
    * `nBits` pseudo-random hyperplanes. The hyperplane for bit b and
    * dimension i is a deterministic hash-derived pseudo-gaussian in [-0.5,
    * 0.5) — public construction, reproducible everywhere, no stored model.
    * Vectors in the same bucket are candidate near-neighbours; used to cut
    * the O(n²) brute-force search to per-bucket joins at scale.
    */
  /** Banded multi-table hyperplane signatures: one bucket id per table
    * (codegen'd kernel — see VectorExpressions.HyperplaneBuckets). The
    * OR-of-AND construction for cosine radius search: per-table collision
    * probability is p^bits (p = 1 − θ/π), detection over L tables is
    * 1 − (1 − p^bits)^L — tune (bits, tables) like MinHash banding.
    */
  def hyperplaneBuckets(v: Column, bitsPerTable: Int, tables: Int): Column =
    graft.expressions.VectorExpressions.hyperplaneBuckets(v, bitsPerTable, tables)

  /** Deterministic Rademacher (±1) hyperplanes for the PORTABLE bucket
    * variant: component (b, d) is +1 when the low bit of the 64-bit value
    * `('0x' || substr(md5('b:d'), 1, 16))::UBIGINT` is set, else −1.
    * Sign-random projections are a valid cosine-LSH family (±1 entries are
    * 2-stable enough for the sign test — Charikar 2002 §3, Achlioptas
    * 2001 sparse projections), and ±1 multipliers keep the dot product an
    * EXACT sequence of additions, so any engine that sums left-to-right
    * reproduces the same sign and therefore the same bucket.
    */
  def portableHyperplanes(nBits: Int, dim: Int, prefix: String = ""): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        // single source of truth for the sign derivation (shared with the
        // PortableHyperplaneBuckets codegen kernel)
        graft.expressions.VecOps.radSign(s"$prefix$b:$d")
      }
    }

  /** Engine-portable LSH bucket id: sign bits of the [[portableHyperplanes]]
    * projections, baked into the plan as array literals — the q50 oracle
    * bakes the SAME literals into its SQL, so bucket assignment is
    * engine-exact. `dim` must match the embedding dimension.
    */
  def lshBucketPortable(v: Column, nBits: Int, dim: Int): Column =
    portableHyperplanes(nBits, dim).zipWithIndex
      .map { case (w, b) =>
        when(dot(v, lit(w)) >= 0, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce((a, b) => a.bitwiseOR(b))

  /** Portable multi-table signatures: table t uses [[portableHyperplanes]]
    * with prefix "t:", one bucket id per table — the engine-exact twin of
    * [[hyperplaneBuckets]] for the q49 oracle. Delegates to the codegen'd
    * kernel: tables×bits wide Column dot products overflow the whole-stage
    * method budget and drop the projection to interpreted eval (measured
    * 5.2 s vs sub-second at sf0.1).
    */
  def hyperplaneBucketsPortable(v: Column, bitsPerTable: Int, tables: Int,
      dim: Int): Column =
    graft.expressions.VectorExpressions.portableHyperplaneBuckets(v, bitsPerTable, tables, dim)

  def lshBucket(v: Column, nBits: Int): Column =
    (0 until nBits)
      .map { b =>
        val proj = aggregate(
          zip_with(
            v,
            sequence(lit(0), size(v) - 1),
            // hash-derived coefficient in [-0.5, 0.5)
            (x, i) => x * (pmod(xxhash64(lit(b), i), lit(1000000L)).cast("double") / 1e6 - 0.5),
          ),
          lit(0.0),
          (acc, x) => acc + x,
        )
        when(proj > 0, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce((a, b) => a.bitwiseOR(b))
}
