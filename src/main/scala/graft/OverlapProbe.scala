package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Stage attribution for q_corpus_overlap (VERDICT r18 #2 follow-up): the
  * row is the registry's most expensive at sf0.1 (5.3 s) on a 1.5 MB
  * corpus, so the cost is structural, not data volume. Times each
  * sub-frame of [[graft.operators.Dedup.corpusOverlap]] in isolation
  * (min of `runs` full materializations, same discipline as Bench) so
  * the optimization targets the measured term.
  *
  * usage: runMain graft.OverlapProbe <sfDir> [runs]
  */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[overlap] $label%-28s min=${ts.min}%7.3f s  runs=" +
        ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }

    val docs = graft.core.Tables.documents(spark, sfDir)
    // warm-up: JIT + page cache
    docs.select(col("source")).queryExecution.toRdd.count()

    val OverlapP = 2147483647L

    // 1. raw tokenize+shingle+explode scan (no aggregation)
    time("scan+explode") {
      docs.select(col("source").as("src"),
        explode(shingles(tokens(col("text")), 3)).as("s"))
    }
    // 2. + groupBy(s).collect_set(src) — the one keyed exchange
    time("perS(groupBy+collect_set)") {
      docs.select(col("source").as("src"),
        explode(shingles(tokens(col("text")), 3)).as("s"))
        .groupBy(col("s")).agg(collect_set(col("src")).as("srcs"))
    }
    // 3. + md5 per distinct shingle
    time("perS+md5") {
      docs.select(col("source").as("src"),
        explode(shingles(tokens(col("text")), 3)).as("s"))
        .groupBy(col("s")).agg(collect_set(col("src")).as("srcs"))
        .select(pmod(md5Hash60(col("s")), lit(OverlapP)).as("x"),
          sort_array(col("srcs")).as("srcs"))
    }
    // 4. the full registry row
    time("corpusOverlap(full)") {
      graft.operators.Dedup.corpusOverlap(docs, "source", "text")
        .orderBy("src_a", "src_b")
    }
    spark.stop()
  }
}
