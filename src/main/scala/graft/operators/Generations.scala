package graft.operators

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-manifest plumbing shared by the persisted stores whose
  * surfaces are laid out as one `gen=<g>` directory per ingested batch
  * ([[Indexing]], [[VectorStore]], [[LmStore]]).
  *
  * The manifest (`<storeDir>/_MANIFEST`, one generation name per line) is
  * the store's SINGLE COMMIT POINT — the generation-pointer indirection
  * that makes the store safe to read while it is maintained:
  *
  *  - A batch write (build / append / stream replay) writes every
  *    surface's `gen=<g>` directory FIRST and flips the manifest LAST:
  *    readers resolve the manifest once per query, so a crashed
  *    multi-surface write is invisible (its orphan directories are
  *    referenced by nothing) rather than half-visible. The flip commits
  *    all surfaces of a generation atomically.
  *  - Compaction never deletes what the manifest references: it writes
  *    the folded generation as a NEW `gen=c<n>` directory set, flips the
  *    manifest to point at it, and leaves the folded directories on disk
  *    until the NEXT compaction's sweep. A reader that resolved the old
  *    manifest keeps a complete, immutable view for a full maintenance
  *    cycle — the delete+rename swap's "concurrent reader loses its
  *    directory" window is gone. (One compaction cycle is the documented
  *    grace bound; a query outliving two compactions of the same store
  *    needs a snapshot-isolated table format instead.)
  *  - The manifest flip itself is a write-to-temp + overwrite-rename
  *    ([[FileContext]] `Options.Rename.OVERWRITE` — atomic on HDFS and
  *    POSIX filesystems), so readers see the old list or the new list,
  *    never a torn file.
  *
  * WRITERS remain single-writer (appends serialized with compaction, the
  * contract every store documents); the manifest removes the concurrent
  * READER hazard and narrows every multi-directory commit to one
  * filesystem op. This is deliberately the small end of the table-format
  * spectrum (an Iceberg/Delta snapshot pointer without version history);
  * a production deployment on object storage would swap in such a format
  * wholesale — the store layouts already match its segment model.
  */
object Generations {

  private val ManifestName = "_MANIFEST"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The committed generation names. Fails fast on a directory that has
    * no manifest — an uncommitted build or not a store at all. */
  def live(spark: SparkSession, storeDir: String): Seq[String] = {
    val fs = fsOf(spark, storeDir)
    val p = new Path(storeDir, ManifestName)
    require(fs.exists(p),
      s"no $ManifestName under $storeDir — not a committed store")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Atomically replace the manifest — the store's commit point. */
  def commit(spark: SparkSession, storeDir: String, gens: Seq[String]): Unit = {
    require(gens.nonEmpty, "a store must reference at least one generation")
    require(gens.distinct == gens, s"duplicate generation in $gens")
    val fs = fsOf(spark, storeDir)
    fs.mkdirs(new Path(storeDir))
    val tmp = new Path(storeDir, ManifestName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((gens.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    FileContext.getFileContext(new Path(storeDir).toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(storeDir, ManifestName), Options.Rename.OVERWRITE)
  }

  /** Commit `gen` into the manifest if absent (idempotent under stream
    * replay — a second delivery of the same batch re-adds nothing). */
  def add(spark: SparkSession, storeDir: String, gen: String): Unit = {
    val l = live(spark, storeDir)
    if (!l.contains(gen)) commit(spark, storeDir, l :+ gen)
  }

  /** Read one surface restricted to the given generations: explicit
    * `gen=` directory paths anchored by `basePath`, so the partition
    * columns (`gen`, and `shard`/`cell` below it) still infer and a
    * static IN on them still prunes to the probed directories. */
  def readSurface(spark: SparkSession, storeDir: String, surface: String,
      gens: Seq[String]): DataFrame = {
    require(gens.nonEmpty, s"readSurface($surface): no generations")
    spark.read.option("basePath", s"$storeDir/$surface")
      .parquet(gens.map(g => s"$storeDir/$surface/gen=$g"): _*)
  }

  /** [[readSurface]] with an EXPLICIT schema (partition columns included —
    * Spark fills them from the directory names): no footer-based schema
    * inference, so the read survives generations whose partitioned write
    * produced no data file (an empty batch surface) and skips the
    * per-generation footer open at resolution time. */
  def readSurfaceAs(spark: SparkSession, storeDir: String, surface: String,
      gens: Seq[String], schema: org.apache.spark.sql.types.StructType): DataFrame = {
    require(gens.nonEmpty, s"readSurfaceAs($surface): no generations")
    spark.read.option("basePath", s"$storeDir/$surface").schema(schema)
      .parquet(gens.map(g => s"$storeDir/$surface/gen=$g"): _*)
  }

  /** [[readSurfaceAs]] over a surface whose generations MIX two layouts:
    * DIRECTORY-PARTITIONED by `partCol` (corpus-sized builds and
    * compactions — a static IN on `partCol` prunes to the probed
    * directories) and FLAT SEGMENTS (batch appends: `partCol` is an
    * ordinary data column and the generation is a handful of batch-sized
    * files — the Lucene segment shape). The same `partCol` filter
    * applies to both: directory pruning on the partitioned group, a
    * row-group-skippable data filter on the flat group, whose total size
    * is bounded by the compaction cadence, so reading it is batch-bound
    * by construction. One spark.read cannot span both directory depths,
    * so the generation list is split by a per-generation directory probe
    * (generation count is bounded by that same cadence) and the two
    * reads align on `schema`'s column order before the union.
    */
  def readSurfaceMixed(spark: SparkSession, storeDir: String,
      surface: String, gens: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      partCol: String): DataFrame = {
    require(gens.nonEmpty, s"readSurfaceMixed($surface): no generations")
    val fs = fsOf(spark, storeDir)
    val (parted, flat) = gens.partition { g =>
      val d = new Path(s"$storeDir/$surface/gen=$g")
      fs.exists(d) &&
        fs.listStatus(d).exists(_.getPath.getName.startsWith(partCol + "="))
    }
    val cols = schema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col)
    Seq(parted, flat).filter(_.nonEmpty)
      .map(gs => readSurfaceAs(spark, storeDir, surface, gs, schema)
        .select(cols: _*))
      .reduce(_ unionByName _)
  }

  /** On-disk generation names of a surface — committed, orphaned by a
    * crashed write, or folded-but-not-yet-swept alike. */
  def onDisk(spark: SparkSession, storeDir: String, surface: String): Seq[String] = {
    val fs = fsOf(spark, storeDir)
    val p = new Path(s"$storeDir/$surface")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("gen=")).map(_.stripPrefix("gen="))
  }

  /** Next free auto-numbered generation name, scanning the DISK listing
    * of every surface (not the manifest): a crashed write's orphan still
    * occupies its name, so it is never silently reused. */
  def nextName(spark: SparkSession, storeDir: String, surfaces: Seq[String],
      prefix: Char): String = {
    val used = surfaces.flatMap(onDisk(spark, storeDir, _)).toSet
    val nums = used.collect {
      case s if s.length > 1 && s.head == prefix && s.tail.forall(_.isDigit) =>
        s.tail.toInt
    }
    s"$prefix${if (nums.isEmpty) 0 else nums.max + 1}"
  }

  /** Delete every on-disk generation directory the manifest does not
    * reference (and `protect` does not name): generations folded by the
    * previous compaction — their reader-grace window has lapsed — and
    * orphans of crashed writes. Runs at the START of a compaction, so a
    * generation is swept exactly one maintenance cycle after it was
    * folded. `protect` carries the stream generations whose batches the
    * checkpoint has not committed: a crashed stream write's directories
    * must survive until its replay rewrites them. */
  def sweepUnreferenced(spark: SparkSession, storeDir: String,
      surfaces: Seq[String], protect: Set[String] = Set.empty): Unit = {
    val fs = fsOf(spark, storeDir)
    val referenced = live(spark, storeDir).toSet ++ protect
    for (surface <- surfaces;
         gen <- onDisk(spark, storeDir, surface) if !referenced(gen))
      fs.delete(new Path(s"$storeDir/$surface/gen=$gen"), true)
  }
}
