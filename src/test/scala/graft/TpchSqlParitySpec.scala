package graft

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** SQL-surface parity: every TPC-H row must produce IDENTICAL results when
  * typed as SQL against registered views (`spark.sql`) as through the
  * DataFrame API — the surface a human reaches for first, and a guard
  * against API-only idioms creeping into the engine (r14, VERDICT item 4).
  *
  * The SQL texts are the queries' own DuckDB oracle strings run through a
  * three-rule dialect bridge (`x::T` → CAST, DuckDB's
  * `datediff('day', start, end)` → Spark's `datediff(end, start)`,
  * `strftime` → `date_format`) — so the SAME semantics file drives the
  * DuckDB differential AND the Spark SQL surface, and any drift between
  * the three execution paths (DataFrame API, Spark SQL, DuckDB) fails a
  * gate. */
class TpchSqlParitySpec extends SparkSpec {

  private val names = Seq(
    "q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
    "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10",
    "q_tpch_q11", "q_tpch_q12", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15",
    "q_tpch_q16", "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q20",
    "q_tpch_q21", "q_tpch_q22")

  private def registerViews(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => Tables.load(spark, sf0, t).createOrReplaceTempView(t))

  /** DuckDB → Spark SQL dialect bridge (see class doc). */
  private def toSparkSql(duck: String): String = duck
    .replaceAll("""(\w+\([^()]*\)|[\w.]+)::(\w+)""", "CAST($1 AS $2)")
    .replaceAll(
      """datediff\('day',\s*(CAST\([^()]*\)|[\w.]+),\s*(CAST\([^()]*\)|[\w.]+)\)""",
      "datediff($2, $1)")
    .replaceAll("""strftime\(([\w.]+),\s*'%Y-%m-%d'\)""",
      "date_format($1, 'yyyy-MM-dd')")

  /** Column-name-sorted, row-sorted value matrix (the driver's compare
    * shape) — makes the check independent of output column order and of
    * ORDER BY tie-breaks. */
  private def rowsOf(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString))
      .sortBy(_.mkString("|"))
  }

  names.foreach { name =>
    test(s"SQL surface equals DataFrame API: $name") {
      registerViews()
      val api = SparkEntry.queries(name)(spark, sf0)
      val sql = spark.sql(toSparkSql(SparkEntry.oracleSql(name)))
      assert(sql.columns.sorted.toSeq == api.columns.sorted.toSeq,
        s"column sets differ: ${sql.columns.mkString(",")} vs ${api.columns.mkString(",")}")
      val a = rowsOf(api)
      val b = rowsOf(sql)
      assert(a.length == b.length, s"row counts differ: api ${a.length} sql ${b.length}")
      assert(a == b)
    }
  }
}
