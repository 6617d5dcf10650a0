package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-level boilerplate removal — the crawl-cleaning pass that strips
  * navigation menus, cookie banners, and footer templates: a LINE that
  * appears in at least `minFrac` of a source's documents is template
  * chrome, not content, and is removed from every document of that
  * source while document-specific lines survive verbatim (CCNet /
  * RefinedWeb-style line-frequency filtering).
  *
  * Scale shape: line counting is one (source, line)-keyed aggregation
  * with map-side partials over DISTINCT lines per doc; the detected
  * boilerplate set is BOUNDED BY CONSTRUCTION (a line must recur in ≥
  * minFrac of a source's docs, so a source can carry at most
  * lines-per-doc / minFrac of them) and comes back as one broadcast
  * per-source line array — reconstruction is then a per-row codegen'd
  * `filter` over the split text, preserving original line order, with
  * NO corpus-sized shuffle on the rebuild side.
  */
object Boilerplate {

  /** (source, line) frequencies over distinct per-doc lines. Counts
    * DISTINCT doc ids — not rows — so duplicate rows for the same doc id
    * can't inflate a unique line past the minFrac threshold (the
    * denominator below is countDistinct(id) too; both sides must agree). */
  private def lineCounts(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame =
    docs.select(col(srcCol).as("src"), col(idCol).as("id"),
        explode(array_distinct(split(col(textCol), "\n"))).as("line"))
      .groupBy(col("src"), col("line"))
      .agg(countDistinct(col("id")).as("n_docs_with"))

  /** The detected boilerplate lines per source:
    * (source, line, n_docs_with, n_docs) for lines present in ≥ minFrac
    * of the source's documents. The inspectable surface a curation run
    * ships alongside its cleaned corpus. */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, minFrac: Double = 0.5): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"minFrac must be in (0,1]: $minFrac")
    val nd = docs.groupBy(col(srcCol).as("src"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
    lineCounts(docs, idCol, textCol, srcCol)
      .join(broadcast(nd), Seq("src"))
      .filter(col("n_docs_with") >= col("n_docs") * minFrac)
      .select(col("src").as(srcCol), col("line"), col("n_docs_with"),
        col("n_docs"))
  }

  /** The detected boilerplate set folded per source: one (src, blines)
    * row per source — bounded by construction (see [[boilerplateLines]]),
    * always broadcast by its consumers. Shared by [[stripBoilerplate]]
    * and [[QualityGate.qualityGate]]'s boiler-fraction signal so the two
    * can never diverge on what counts as a boilerplate line. */
  private[operators] def boilerplateSets(docs: DataFrame, idCol: String,
      textCol: String, srcCol: String, minFrac: Double): DataFrame =
    boilerplateLines(docs, idCol, textCol, srcCol, minFrac)
      .groupBy(col(srcCol).as("src"))
      .agg(collect_set(col("line")).as("blines"))

  /** Null-safe membership in a (possibly absent) broadcast line set. */
  private[operators] val isBoiler: (Column, Column) => Column = (bl, l) =>
    coalesce(array_contains(bl, l), lit(false))

  /** Documents with their sources' boilerplate lines removed: (id,
    * cleaned text). Line order is preserved; a document that was ALL
    * boilerplate comes back as the empty string (kept, so the caller
    * decides whether to drop it — dropping is a quality-gate policy,
    * not a cleaning one). */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, minFrac: Double = 0.5): DataFrame = {
    val perSource = boilerplateSets(docs, idCol, textCol, srcCol, minFrac)
    docs.join(broadcast(perSource), docs(srcCol) === col("src"), "left")
      .select(col(idCol),
        array_join(
          filter(split(col(textCol), "\n"), l => !isBoiler(col("blines"), l)),
          "\n").as("clean_text"))
  }
}
