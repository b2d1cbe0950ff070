package graft

import org.apache.spark.sql.SparkSession

object Bench {
  /** Headline queries surfaced in the stdout JSON line — one or two
    * representatives per operator family (the totals still cover EVERY
    * registered query; this only bounds the line length). */
  val headline: Set[String] = Set(
    "q1_agg", "lf_filter_extract", "lf_filter_eq_str",
    "q_tpch_q5", "q_join_star", "q_join_salted", "q_range_join",
    "q_range_join_keyed",
    "q_window_rank", "q_cube", "q_hll_distinct",
    "q_dedup_exact", "q_dedup_ngram", "q_dedup_minhash", "q_dedup_clusters",
    "q_dedup_embed", "q_bloom_novel", "q_ann_topk_agg", "q_ann_lsh",
    "q_ann_kmeans", "q_lang_id", "q_tfidf", "q_gapfill",
    "q_stream_tumbling", "q_stream_join", "q_stream_stateful")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // streaming state partitions sized to the single-file harness input,
      // not the 32-way batch shuffle width (see EventStreams doc)
      .config("graft.streaming.shufflePartitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: absorb JVM/classloader/codegen startup so per-query numbers
    // measure the queries, not session bootstrap (SURVEY.md §6: the real
    // risk at small SF is fixed overhead). Runs the flagship once at the
    // smallest SF, then one tiny scan of the bench dir.
    try {
      SparkEntry.entry(spark).count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    } catch { case _: Throwable => () }

    // A failed query surfaces in "failed" (and on stderr) and is excluded
    // from the total, instead of silently skewing the benchmark.
    // Optional args restrict the run to the named queries (tuning loop).
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
      else SparkEntry.queries
    // Each query runs twice and reports the min: a transient host-load
    // spike during one pass (the BENCH_r03 q_join_* contamination) can't
    // masquerade as a regression. SPARK_GRAFT_BENCH_RUNS overrides.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // (name, per-run times of the runs that SUCCEEDED, count of failed runs)
    val results: Seq[(String, Seq[Double], Int)] =
      selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val times = (1 to runs).flatMap { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); None
          }
        }
        (name, times, runs - times.size)
      }
    // Full per-query timings go to stderr (the local tuning loop reads
    // them) INCLUDING every individual run — min-of-N hides which run paid
    // a shared-scan / JIT cost, and attribution shifts inside memoized
    // families are only diagnosable when both runs are visible in the
    // artifact. stdout gets ONE COMPACT JSON line — total over every
    // query, but only the headline per-query map, rounded — because the
    // driver keeps just the last ~2000 output chars and a line carrying
    // all 110+ queries at full double precision gets truncated past
    // parseability.
    results.foreach { case (k, ts, nf) =>
      val runsStr = ts.map(t => f"$t%.3f").mkString("[", ", ", "]")
      val flag = if (ts.isEmpty) "  FAILED"
                 else if (nf > 0) s"  FLAKY($nf/$runs runs failed)" else ""
      System.err.println(f"[bench] $k%-24s ${ts.headOption.fold(0.0)(_ => ts.min)}%9.3f s  runs=$runsStr$flag")
    }
    def r3(v: Double): String = f"$v%.3f"
    val qs = results.collect { case (k, ts, _) if ts.nonEmpty && Bench.headline(k) =>
      s"\"" + k + "\":" + r3(ts.min)
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, ts, _) if ts.isEmpty => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    // A query that failed on SOME run but succeeded on another is flaky —
    // previously it silently folded into success; report it separately so
    // nondeterministic failures can't hide behind min-of-N.
    val flaky = results.collect { case (k, ts, nf) if ts.nonEmpty && nf > 0 =>
      s"\"" + k + "\":" + nf
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, ts, _) if ts.nonEmpty => ts.min }.sum
    // Host 1-minute loadavg at end of run: a value far above the allotted
    // CPU count means another process contended for the machine and the
    // numbers should be re-run before being believed.
    val loadavg =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      catch { case _: Throwable => "-1" }
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.count(_._2.nonEmpty)},"runs_per_query":$runs,"loadavg":$loadavg,"queries":$qs,"failed":$failed,"flaky":$flaky,"sf":"$sfDir"}""")
    spark.stop()
  }
}
