package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage attribution for q_dedup_containment (VERDICT r18 #5): times each
  * sub-frame of [[graft.operators.Dedup.containmentPairsFrom]] over a
  * persisted shingle-set frame (the registry row's session-cached
  * context), and reports the candidate-pair count vs verified-pair count
  * — the prefix-filter selectivity the verdict asks for.
  *
  * usage: runMain graft.ContainProbe <sfDir> [runs]
  */
object ContainProbe {
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

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[contain] $label%-26s min=${ts.min}%7.3f s  runs=" +
        ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }

    val docs = graft.core.Tables.documents(spark, sfDir)
    val sets = graft.operators.Dedup.shingleSigSets(docs, "doc_id", "text", 3)
    sets.queryExecution.toRdd.count() // materialize the cache (warmup row)

    val tau = 0.9
    def ceilTau(n: org.apache.spark.sql.Column, t: Double) =
      ceil(n.cast("double") * t).cast("int")

    val sh = sets.select(col("doc_id"), col("n"), explode(col("ss")).as("h"))
    time("sh(explode)") { sh }
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    time("dfreq") { dfreq }
    val prefix = sh.join(dfreq, "h")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
      .where(col("rk") <= col("n") - ceilTau(col("n"), tau) + 1)
      .select(col("doc_id"), col("h"))
    time("prefix(join+window)") { prefix }
    val postings = sh.select(col("doc_id"), col("h")).repartition(col("h"))
    val cand = prefix.repartition(col("h")).as("a")
      .join(postings.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    time("cand(join+distinct)") { cand }
    time("full(verify)") {
      graft.operators.Dedup.containmentPairsFrom(sets, tau)
    }
    val nCand = cand.count()
    val nVerified = graft.operators.Dedup.containmentPairsFrom(sets, tau).count()
    val nDocs = sets.count()
    val nShingles = sh.count()
    System.err.println(s"[contain] docs=$nDocs shingle_rows=$nShingles " +
      s"candidates=$nCand verified=$nVerified " +
      f"(selectivity ${nVerified.toDouble / math.max(1, nCand)}%.4f)")
    spark.stop()
  }
}
