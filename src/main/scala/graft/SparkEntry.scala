package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator surface (SURVEY.md §2.11): each
  * entry is a deterministic query over the fixture tables at `dir`,
  * and (where ANSI-SQL-expressible) `oracleSql` carries its DuckDB
  * twin for the driver's hash-match correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      WindowScalarQueries.queries ++
      StreamEquivQueries.queries ++
      LlmTextQueries.queries ++
      LlmSimQueries.queries ++
      CdcOpQueries.queries ++
      CurationQueries.queries ++
      CorpusStatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
      WindowScalarQueries.oracle ++
      StreamEquivQueries.oracle ++
      LlmTextQueries.oracle ++
      LlmSimQueries.oracle ++
      CdcOpQueries.oracle ++
      CurationQueries.oracle ++
      CorpusStatQueries.oracle
}
