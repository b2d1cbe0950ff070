package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for q_approx_percentile: the row carries TWO
  * aggregate buffers (the exact Percentile value buffer and the
  * approx_percentile sketch) — time each alone to see which one the
  * 2.6 s belongs to before restructuring anything.
  *
  * usage: runMain graft.PctProbe <sfDir> [runs]
  */
object PctProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val runs = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[pct] $label%-24s min=${ts.min}%7.3f s  runs=" +
        ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }

    val li = graft.core.Tables.lineitem(spark, sfDir)
    li.select(col("l_extendedprice")).queryExecution.toRdd.count() // warm

    val ps = Seq(0.5, 0.95, 0.99)
    val allQs = ps.flatMap(p => Seq(math.max(0.0, p - 0.005), p, math.min(1.0, p + 0.005)))
    time("exact percentile x9") {
      li.agg(percentile(col("l_extendedprice"), array(allQs.map(lit): _*)).as("q9"))
    }
    time("approx sketch x3") {
      li.agg(approx_percentile(col("l_extendedprice"),
        array(ps.map(lit): _*), lit(10000)).as("ap"))
    }
    time("both (registry shape)") {
      li.agg(
        approx_percentile(col("l_extendedprice"), array(ps.map(lit): _*), lit(10000)).as("ap"),
        percentile(col("l_extendedprice"), array(allQs.map(lit): _*)).as("q9"))
    }
    spark.stop()
  }
}
