package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev-only plan printer for iterating on plan-shape assertions. */
object PlanDump {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val name = if (a.nonEmpty) a(0) else "q_sessionize"
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
