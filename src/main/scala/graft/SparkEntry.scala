package graft

import graft.queries.{AnalysisQueries, ClassifyQueries, CorpusQueries, CurationQueries, ExtendedQueries, PipelineQueries, RelationalQueries, StoreQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 re-expressed over
  * the driver corpus + the LLM-pipeline operators); `oracleSql` carries a
  * DuckDB twin for every SQL-expressible query. Queries without an oracle
  * (xxhash64-based MinHash/SimHash/LSH, seeded ML) get the driver's
  * rows-only check and are invariant-tested in ScalaTest.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q13_district_monthly")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++ PipelineQueries.queries ++
      ExtendedQueries.queries ++ CorpusQueries.queries ++ CurationQueries.queries ++
      StoreQueries.queries ++ AnalysisQueries.queries ++ ClassifyQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++ PipelineQueries.oracles ++
      ExtendedQueries.oracles ++ CorpusQueries.oracles ++ CurationQueries.oracles ++
      StoreQueries.oracles ++ AnalysisQueries.oracles ++ ClassifyQueries.oracles
}
