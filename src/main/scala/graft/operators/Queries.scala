package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) its DuckDB oracle twin. Column names
  * and dtypes must match exactly — the driver sorts columns by name and
  * hashes values (see the builder contract in SparkEntry). */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(fn, Some(sql.trim))
  def noOracle(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)
}
