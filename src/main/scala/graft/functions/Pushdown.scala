package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parquet-pushable range predicates over a FINE CLUSTER KEY — the
  * row-group/page-skipping primitive behind the persisted stores' serving
  * scans. A store writes each row's `ck = hash(key) mod domain` and sorts
  * files by it; a serving batch collects its own (bounded-by-domain) ck
  * set and filters the scan with an OR of closed ranges. Ranges — not a
  * large IN — because Spark's parquet pushdown converts a large `In` to a
  * single min/max envelope (useless for a scattered hash set), while an
  * OR of `[lo, hi]` conjunctions converts disjunct-by-disjunct, so sorted
  * row groups and pages whose ck stats miss every range are skipped at
  * the reader. The predicate is a SUPERSET filter by construction (every
  * batch key's ck is in the set); exactness always comes from the join
  * above it.
  */
object Pushdown {

  /** The shared fine-cluster-key scheme: `ck = hash1(key) mod 8192`,
    * seeded independently of the stores' shard hashes (which are
    * `hash(key) mod nShards`) so the two don't correlate when nShards
    * divides the domain. 8192 cells × the range cap of 192 keeps the
    * pushed predicate small. The pushdown is ADAPTIVE (see [[ckFilter]]):
    * it applies only to SELECTIVE key sets — roughly up to a few hundred
    * distinct cks, where the capped range cover stays under 1/8 of the
    * domain. Denser batches hash-scatter past the cover threshold and
    * intentionally fall back to the plain broadcast-join plan (`true`),
    * which was already flat before this primitive existed. */
  val CkDomain = 8192L
  val CkRangeCap = 192

  /** On-disk LAYOUT VERSION of the ck-clustered store file format,
    * stamped into each ck-carrying store's meta at build time and
    * REQUIRED at read ([[requireLayout]]). The ck column arrived in
    * layout 2: a generation written before it reads `ck` as null under
    * the stores' explicit surface schemas, and [[ckFilter]]'s range
    * predicate evaluates null as drop-row — serving reads would silently
    * lose every old-generation row, and the append-only guards would
    * silently PASS for already-ingested ids (double ingestion). Failing
    * loudly on the version mismatch turns that silent corruption into an
    * instruction to rebuild. */
  val LayoutVersion = 2

  /** Require a store's meta frame to carry the CURRENT layout version —
    * called by every readMeta of a ck-carrying store, so a store built
    * by an older layout fails loudly at open instead of silently losing
    * rows behind the range pushdown. */
  def requireLayout(meta: org.apache.spark.sql.DataFrame,
      storeDir: String): Unit = {
    require(meta.columns.contains("layout_version"),
      s"store $storeDir carries no layout_version stamp in meta (current " +
        s"layout is $LayoutVersion). Either it predates the ck layout — " +
        "its generations then read ck as null and silently vanish behind " +
        "the ck range pushdown while the append-only guards pass for " +
        "already-ingested ids — or it was built by ck-era code from " +
        "before the stamp existed and only the stamp is missing. The " +
        "stamp is what makes the two distinguishable from here on; " +
        "rebuild the store with the current code.")
    val v = meta.select(col("layout_version")).head().getInt(0)
    require(v == LayoutVersion,
      s"store $storeDir carries layout_version $v but this code reads " +
        s"layout $LayoutVersion — rebuild the store with the current code")
  }

  def ckOf(key: Column): Column =
    pmod(xxhash64(lit(1L), key), lit(CkDomain)).cast("int")

  /** One bounded driver job: the distinct (partition, ck) footprint of a
    * keyed frame — partition values for PATH pruning, ck values for the
    * in-file range pushdown. Both sets are domain-bounded (nShards /
    * CkDomain), never batch-bounded. */
  def footprint(df: org.apache.spark.sql.DataFrame, part: Column,
      ck: Column): (Array[Int], Array[Int]) = {
    val r = df.select(part.as("p"), ck.as("k"))
      .agg(collect_set(col("p")).as("ps"), collect_set(col("k")).as("ks"))
      .head()
    (r.getSeq[Int](0).toArray, r.getSeq[Int](1).toArray)
  }

  /** The pushable predicate over a stored `ck` column for a batch's ck
    * set — superset semantics; join above for exactness. ADAPTIVE: range
    * pruning only pays when the key set is SELECTIVE. A large batch (a
    * few thousand distinct keys) hash-scatters over most of the domain,
    * so its capped range cover approaches the whole domain — the
    * predicate then skips nothing while costing an N-disjunct evaluation
    * on every scanned row (measured: the span probe's 50-doc batch went
    * LINEAR in the corpus, 2.7→32 s per 32×, purely from this term).
    * When the coalesced ranges cover more than 1/8 of the domain the
    * filter degrades to `true` (Catalyst eliminates it) and the serving
    * plan is exactly the broadcast-join gate alone — point lookups and
    * small probes keep the page-skipping win, dense batches keep the
    * old flat plan. */
  def ckFilter(cks: Array[Int]): Column = {
    val rs = ranges(cks, CkRangeCap)
    val covered = rs.map { case (lo, hi) => hi.toLong - lo + 1 }.sum
    if (covered * 8 > CkDomain) lit(true)
    else inRanges(col("ck"), rs)
  }

  /** Collapse a set of key values into at most `cap` closed ranges:
    * adjacent values fuse into runs, then the runs with the SMALLEST gaps
    * between them merge first until the cap holds — minimizing the extra
    * covered width (false-positive ck values) the cap costs.
    */
  def ranges(values: Array[Int], cap: Int): Seq[(Int, Int)] = {
    require(cap >= 1, s"ranges: cap must be >= 1, got $cap")
    val vs = values.distinct.sorted
    if (vs.isEmpty) return Seq.empty
    // runs of consecutive values
    val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var lo = vs.head
    var hi = vs.head
    for (v <- vs.tail) {
      if (v == hi + 1) hi = v
      else { runs += ((lo, hi)); lo = v; hi = v }
    }
    runs += ((lo, hi))
    if (runs.length <= cap) return runs.toSeq
    // merge across the (runs-cap) smallest inter-run gaps
    val gaps = runs.indices.dropRight(1)
      .map(i => (runs(i + 1)._1 - runs(i)._2, i))
      .sorted.take(runs.length - cap).map(_._2).toSet
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var cur = runs.head
    for (i <- runs.indices.dropRight(1)) {
      if (gaps(i)) cur = (cur._1, runs(i + 1)._2)
      else { out += cur; cur = runs(i + 1) }
    }
    out += cur
    out.toSeq
  }

  /** The OR-of-closed-ranges predicate over `c`. Empty ranges (an empty
    * batch) yield `false` — nothing can match. */
  def inRanges(c: Column, rs: Seq[(Int, Int)]): Column =
    if (rs.isEmpty) lit(false)
    else rs.map { case (lo, hi) =>
      if (lo == hi) c === lit(lo) else c >= lit(lo) && c <= lit(hi)
    }.reduce(_ || _)
}
