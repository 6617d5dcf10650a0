package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-deduplication operators for training-data pipelines, from exact
  * to fuzzy:
  *
  *  - [[exactDupGroups]] / [[dropExactDups]]: content-hash groupBy — one
  *    shuffle on a 128-bit key, arbitrarily parallel.
  *  - [[minHashLsh]]: MinHash + banded LSH (Broder 1997 / Leskovec MMDS
  *    ch.3) — candidate pairs only ever meet inside a band-bucket join, so
  *    the O(n²) comparison collapses to per-bucket joins; at 100 TB the
  *    bucket key (band id, band hash) is the shuffle key and skew is bounded
  *    by bucket size.
  *  - [[simHashDups]]: 64-bit SimHash with hamming-distance radius, blocked
  *    on 16-bit chunks (pigeonhole: distance ≤ 3 ⇒ at least one of 4 chunks
  *    equal) so the self-join is equi-join-able, never a cross join.
  *  - [[ngramJaccardPairs]]: exact n-gram Jaccard on candidate pairs —
  *    used as the verify stage after LSH blocking.
  *  - [[embeddingNearDups]] lives in [[Similarity]] (cosine radius search).
  */
object Dedup {

  /** Groups of byte-identical documents: (text_hash, dup_count, keeper_id).
    * Keeper = smallest id, the standard deterministic survivor policy.
    */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("keeper_id"))

  /** Keep exactly one row per distinct text (smallest id wins). */
  def dropExactDups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(md5(col(textCol)))
            .orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** MinHash-LSH candidate pairs: signature of `k` hashes split into
    * `bands`; docs sharing any band-hash become a candidate pair, then
    * exact shingle-set Jaccard filters to `threshold`.
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands

    // band id + hash of that band's signature slice = LSH bucket key.
    // Deliberately NARROW: only (band, band_hash, id) enters the bucket
    // shuffle — shuffling the shingle arrays through every band would
    // multiply shuffle bytes by `bands` and make bucket skew array-sized.
    val banded = docs
      .select(col(idCol).as("id"),
        minHashSignature(shingles(col(textCol), shingleN), k).as("sig"))
      .select(
        col("id"),
        posexplode(
          array((0 until bands).map { b =>
            xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
          }: _*)
        ).as(Seq("band", "band_hash")),
      )

    val l = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    // a pair can collide in several bands → dedup on the bare id pair
    // (map-side combinable, 16 bytes/row) before touching any array
    val pairs = l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    // verify stage: fetch each side's shingle set once, exact Jaccard
    val sh = docs.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleN)).as("sh"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        graft.expressions.TokenExpressions.jaccardSim(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup pairs within hamming radius `maxDist`, blocked by
    * 16-bit fingerprint chunks so candidates meet in an equi-join.
    */
  def simHashDups(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val fp = docs.select(col(idCol).as("id"), simHash64(col(textCol)).as("fp"))
    val chunked = fp.select(
      col("id"), col("fp"),
      posexplode(
        array((0 until 4).map { c =>
          shiftrightunsigned(col("fp"), c * 16).bitwiseAND(0xffffL)
        }: _*)
      ).as(Seq("chunk", "chunk_val")),
    )
    val l = chunked.select(col("chunk"), col("chunk_val"), col("id").as("id_a"), col("fp").as("fp_a"))
    val r = chunked.select(col("chunk"), col("chunk_val"), col("id").as("id_b"), col("fp").as("fp_b"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b"))
      .distinct()
      .withColumn("dist", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** End-to-end corpus cleaning: exact dedup, then MinHash-LSH fuzzy dedup
    * with union-find-free survivor selection (smallest id in each near-dup
    * pair chain wins greedily: a doc is dropped if it is the LARGER id of
    * any confirmed pair — one pass, no iterative connected components;
    * transitive chains keep their minimum element because every non-min
    * element pairs with something smaller within LSH range).
    * Returns the surviving rows of `docs`.
    */
  def dedupCorpus(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.7,
      k: Int = 32, bands: Int = 16): DataFrame = {
    // default banding 16×2: detection probability 1-(1-j²)^16 ≈ 0.99 at
    // j=0.5 (8×4 banding would coin-flip mid-similarity pairs)
    val exact = dropExactDups(docs, idCol, textCol)
    val pairs = minHashLsh(exact, idCol, textCol,
      shingleN = shingleN, k = k, bands = bands, threshold = threshold)
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    exact.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact word-n-gram Jaccard similarity for given candidate pairs
    * (id_a, id_b) — the verification stage after any blocking scheme.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, n: Int = 3): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      array_distinct(shingles(col(textCol), n)).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        graft.expressions.TokenExpressions.jaccardSim(col("sh_a"), col("sh_b")))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
