package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: dumps `explain("formatted")` for selected queries so
  * pushdown / pruning / join strategy / exchange reuse can be inspected.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]   (default: headliners)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("lf_filter_eq_str", "lf_rows_range", "q1_agg", "q_join_star",
        "q_tpch_q5", "q_range_join", "q_dedup_ngram", "q_dedup_minhash",
        "q_dedup_embed", "q_bloom_novel", "q_ann_topk_agg", "q_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
