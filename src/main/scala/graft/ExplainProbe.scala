package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of any registry
  * query without materializing it. The round discipline is "after each
  * operator works, explain the plan and iterate until it's the plan
  * you'd want" — this makes that a one-liner per query instead of an
  * ad-hoc scratch main each time.
  *
  * usage: runMain graft.ExplainProbe <sfDir> <query> [query ...]
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainProbe <sfDir> <query> [query ...]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"==== $name ====")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"==== $name: NOT IN REGISTRY ====")
      }
    }
    spark.stop()
  }
}
