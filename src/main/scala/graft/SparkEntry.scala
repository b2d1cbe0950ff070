package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: every implemented operator from SURVEY.md §2 (and the
  * extension surface) contributes one `queries` entry; SQL-expressible ones
  * also ship a DuckDB oracle twin in `oracleSql`. Column names/dtypes match
  * pairwise by construction (see graft.core.Norm).
  */
object SparkEntry {

  private def registry: Map[String, Q] =
    ParityQueries.all ++ RelationalQueries.all ++ TpchRemainder.all ++ AdvancedQueries.all ++
      PipelineQueries.all ++ Curation.all ++ EventLifecycle.all ++ Scoring.all ++ Graph.all ++ QualityChecks.all ++
      Tokenize.all ++ IncrementalQueries.all ++ DataSelection.all ++ TimeSeries.all ++
      graft.streaming.StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
