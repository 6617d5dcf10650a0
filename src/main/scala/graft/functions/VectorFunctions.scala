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
