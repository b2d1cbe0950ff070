package graft

import org.apache.spark.sql.SparkSession

object Bench {
  /** Headline queries surfaced in the stdout JSON line — one or two
    * representatives per operator family (the totals still cover EVERY
    * registered query; this only bounds the line length). */
  val headline: Set[String] = Set(
    "q1_agg", "lf_filter_extract", "lf_filter_eq_str",
    "q_tpch_q5", "q_join_star", "q_join_salted", "q_join_salted_forced",
    "q_range_join",
    "q_range_join_keyed",
    "q_window_rank", "q_cube", "q_hll_distinct",
    "q_dedup_exact", "q_dedup_ngram", "q_dedup_minhash", "q_dedup_clusters",
    "q_dedup_embed_lsh", "q_bloom_novel", "q_ann_topk_agg", "q_ann_lsh",
    "q_ann_kmeans", "q_lang_id", "q_tfidf", "q_gapfill",
    "q_rep_signals", "q_contamination", "q_pipeline_e2e", "q_mix_temperature",
    "q_sessionize", "q_scd2", "q_bm25", "q_quality_classifier",
    "q_dup_span_frac", "q_pagerank", "q_snapshot_diff", "q_dq_checks",
    "q_anomaly",
    "q_stream_tumbling", "q_stream_join", "q_stream_stateful",
    "q_stream_anomaly",
    "q_tokenize_bpe", "q_cdc_apply", "q_decontaminate",
    "q_ivm_agg", "q_dsir_sample", "q_ann_rp", "q_ts_resample",
    "q_tpch_q1", "q_boilerplate", "q_entity_match", "q_interval_overlap",
    "q_tpch_q6", "q_tpch_q19", "q_mm_audio", "q_dedup_cross",
    "q_stream_enrich", "q_bpe_pair_stats",
    "q_tpch_q7", "q_tpch_q13", "q_tpch_q17", "q_tpch_q22",
    "q_heavy_hitters", "q_tpch_q8", "q_stream_dedup_wm",
    "q_tpch_q2", "q_tpch_q21", "q_collocations", "q_entity_match_jw",
    "q_bfs_hops", "q_skyline", "q_markov_transitions", "q_assoc_rules",
    "q_weighted_median", "q_benford", "q_quality_top_frac", "q_interleave",
    "q_assoc_topk")

  /** Named warm-up rows: each is the designated first consumer of a
    * session-scoped shared artifact (ParityQueries' lineitem row-id index +
    * cache, the Dedup shingle/sign scan and its two pair-set checkpoints,
    * the token stream, the winnow fingerprint table, the k-means fit).
    * Running them ONCE before the measured loop pins those one-time build
    * costs to explicit rows instead of letting them land on whichever
    * measured query happens to touch the cache first — the attribution
    * drift that made the same queries swing 2–6× between BENCH_r05 and
    * BENCH_r06 with no code change on their paths. */
  val warmupRows: Seq[String] = Seq(
    "lf_dim",          // LazyFrame row-id index build + .cached() fill
    "q_dedup_minhash", // shingleSigSets scan + minhash pair checkpoint
    "q_dedup_ngram",   // PPJoin exact pair checkpoint (reuses the scan)
    "q_vocab",         // tokenize pass (tokStream checkpoint)
    "q_winnow_fp",     // winnowing fingerprint checkpoint
    "q_ann_kmeans")    // k-means codebook fit

  /** Full-materialization execution: run the query's OWN physical plan and
    * iterate every output row. `df.count()` instead re-plans with an
    * Aggregate on top, letting Catalyst PRUNE the output projections —
    * r13 caught q_tokenize_bpe "costing" 0.11 s because the count plan
    * never ran the tokenizer at all (and sorts get eliminated the same
    * way). The reference baseline timed full extraction, so the bench
    * must too. toRdd executes the plan exactly as the query shapes it;
    * iterating the partitions forces every projection without collecting
    * anything to the driver. */
  private def materialize(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  private def loadavg1: String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
    catch { case _: Throwable => "-1" }

  /** (total, steal) jiffies from /proc/stat line 1. Hypervisor STEAL is
    * the contention loadavg cannot see: a VM neighbor taking 4% of cycles
    * shows loadavg 0.5 on an idle-looking host while every sub-second
    * query pays disproportionately (a stolen 100 ms burst on a 300 ms row
    * is +33%). Sampled around the measured loop so the artifact carries
    * the steal share of the leg (r17: direct sampling measured 4.25%
    * steal under load on a loadavg-0.5 "quiet" host — part of the
    * environment term that inflated r16/r17 trivial-row minima vs r15). */
  private def stealSample: (Long, Long) =
    try {
      val parts = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .split("\\s+").drop(1).map(_.toLong)
      // denominator = user..steal (first 8 fields) ONLY: guest/guest_nice
      // are already folded into user/nice by the kernel, so including them
      // double-counts guest time and deflates steal_frac — exactly on the
      // guest-running hosts the probe exists for (ADVICE r17)
      (parts.take(8).sum, if (parts.length > 7) parts(7) else 0L)
    } catch { case _: Throwable => (0L, 0L) }

  /** Fixed-work host-speed canary: SplitMix64 mixed over a constant
    * iteration count, single-threaded and across `threads` workers. The
    * r18 attribution showed cross-round per-row comparisons straddle an
    * unmeasured host-speed term (frequency/placement/steal bands of
    * 1.1-1.4×) — a workload-independent number in every artifact lets a
    * reader normalize two rounds' rows before calling anything a
    * regression. Returns (single_ms, multi_ms); ~0.4 s total. The loop's
    * result is folded into the returned tuple only via a side-effect-free
    * volatile sink so the JIT cannot elide the work. */
  @volatile private var canarySink: Long = 0L
  private def cpuCanary(threads: Int): (Long, Long) = {
    def mix(iters: Long, seed: Long): Long = {
      var x = seed; var i = 0L
      while (i < iters) {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        x ^= z ^ (z >>> 31)
        i += 1
      }
      x
    }
    val itersSingle = 100_000_000L
    mix(itersSingle / 10, 1L) // JIT warm-up, unmeasured
    val t0 = System.nanoTime()
    canarySink ^= mix(itersSingle, 42L)
    val single = (System.nanoTime() - t0) / 1_000_000L
    val t1 = System.nanoTime()
    val ts = (1 to threads).map { k =>
      val t = new Thread(() => { canarySink ^= mix(itersSingle, k.toLong) })
      t.start(); t
    }
    ts.foreach(_.join())
    val multi = (System.nanoTime() - t1) / 1_000_000L
    (single, multi)
  }

  /** Memory-bandwidth canary: stream-sum a 512 MB long array 4× (first
    * pass unmeasured — faults the pages in). The cpu canary runs in
    * registers and cannot see the term that dominates GC wall time (a
    * ParallelGC full collection is a memory-bandwidth workload): r18
    * measured the SAME code/heap/registry spending 10× more GC wall than
    * r17's quiet legs while the compute canary read normal — only a
    * bandwidth number in the artifact can attribute that class of drift.
    * Returns MB/s over the best of 3 measured passes. */
  private def memCanary(): Long = {
    val words = 64 * 1024 * 1024 // 512 MB
    val a = new Array[Long](words)
    var i = 0
    while (i < words) { a(i) = i.toLong; i += 1 } // fault + init, unmeasured
    var best = Long.MaxValue
    var pass = 0
    while (pass < 3) {
      val t0 = System.nanoTime()
      var s = 0L; var j = 0
      while (j < words) { s += a(j); j += 1 }
      canarySink ^= s
      best = math.min(best, System.nanoTime() - t0)
      pass += 1
    }
    (words.toLong * 8 * 1000) / math.max(1L, best / 1000) / 1000 // MB/s
  }

  /** Cumulative stop-the-world GC milliseconds for this JVM. Sampled before
    * and after the measured loop so the artifact carries `gc_ms` — r11's
    * unexplained uniform 2.3× vs r9 would have been attributable in minutes
    * had the artifact recorded whether GC time scaled with it. */
  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** Commit SHA of the code under measurement, so a bench artifact is
    * self-identifying (which tree produced these numbers) without needing
    * the round log. Best-effort: env override first (the A/B harness sets
    * it for detached checkouts), then `git rev-parse`, else "unknown". */
  private def gitSha: String =
    sys.env.get("SPARK_GRAFT_GIT_SHA").getOrElse {
      try {
        // bounded: a hung git (stale index.lock, slow fs) must not block
        // the summary line after every query has already run (r12 review)
        val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
          .redirectErrorStream(true).start()
        if (!p.waitFor(5, java.util.concurrent.TimeUnit.SECONDS)) {
          p.destroyForcibly(); "unknown"
        } else {
          val out = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
          if (p.exitValue() == 0 && out.matches("[0-9a-f]{4,40}")) out else "unknown"
        }
      } catch { case _: Throwable => "unknown" }
    }

  /** Per-query minima merged across legs: union of keys, min per key.
    * The r14 review lost time to a uniform ~1.4× driver-leg inflation that
    * per-query minima across the round's legs would have dismissed on
    * sight — so the artifact now carries them (verdict r14 #6). */
  def mergeMinima(prior: Map[String, Double],
      leg: Map[String, Double]): Map[String, Double] =
    (prior.keySet ++ leg.keySet).iterator.map { k =>
      k -> (prior.get(k).toSeq ++ leg.get(k).toSeq).min
    }.toMap

  /** Round-scoped sidecar carrying the merged minima between legs
    * (`name\tmin` lines + `__legs\tN` and `__sf\tdir` headers; lives in
    * target/, so it never outlives a clean). SPARK_GRAFT_BENCH_MINFILE
    * overrides the path; "none" disables the merge.
    *
    * The `__sf` stamp exists because the sidecar is keyed by query name
    * only: in r15/r16 a full-registry validation run at sf0.01 (the
    * verify-recipe bench step, which didn't set MINFILE=none) merged its
    * ~4× faster rows into the sf0.1 ledger, and those phantom minima
    * shipped as `queries_min_all_legs` — the entire "2–9× inflation on
    * unchanged code" mystery of the r17 verdict was later rounds being
    * compared against sf0.01-contaminated ledgers (r18 attribution,
    * SCALE.md). A ledger recorded at a different sf dir is now discarded,
    * not merged. */
  private def minimaPath: Option[java.nio.file.Path] = {
    val p = sys.env.getOrElse("SPARK_GRAFT_BENCH_MINFILE",
      "target/bench_minima.tsv")
    if (p == "none") None else Some(java.nio.file.Paths.get(p))
  }

  /** Streaming-floor ledger written by `StreamOverheadProbe decompose`
    * (`__parts`/`__epoch_ms` headers + `name\tfloor` rows). Lives in
    * target/ next to the minima sidecar; SPARK_GRAFT_STREAM_FLOORS
    * overrides the path, "none" disables. Returns (floors, parts the
    * floors were measured at, measurement epoch ms). */
  private def readStreamFloors(): Option[(Map[String, Double], Int, Long)] = {
    val p0 = sys.env.getOrElse("SPARK_GRAFT_STREAM_FLOORS",
      "target/stream_floors.tsv")
    if (p0 == "none") return None
    val p = java.nio.file.Paths.get(p0)
    if (!java.nio.file.Files.exists(p)) return None
    try {
      import scala.jdk.CollectionConverters._
      val kv = java.nio.file.Files.readAllLines(p).asScala
        .map(_.split("\t")).collect { case Array(k, v) => k -> v }
      for {
        parts <- kv.collectFirst { case ("__parts", v) => v.toInt }
        epoch <- kv.collectFirst { case ("__epoch_ms", v) => v.toLong }
      } yield (kv.collect { case (k, v) if !k.startsWith("__") =>
        k -> v.toDouble }.toMap, parts, epoch)
    } catch { case _: Throwable => None }
  }

  private def readMinima(sfDir: String, cpus: String): (Map[String, Double], Int) =
    minimaPath match {
      case Some(p) if java.nio.file.Files.exists(p) =>
        try {
          import scala.jdk.CollectionConverters._
          val lines = java.nio.file.Files.readAllLines(p).asScala
            .map(_.split("\t")).collect { case Array(k, v) => k -> v }
          val legs = lines.collectFirst { case ("__legs", v) => v.toInt }
            .getOrElse(0)
          // no-stamp (pre-r18) ledgers are also discarded: their legs'
          // sf is unknowable and the r15/r16 ones were in fact mixed
          val sfStamp = lines.collectFirst { case ("__sf", v) => v }
          // __cpus stamp (VERDICT r18 #2): the r18 8-core scaling run
          // min-merged the 32-core legs' minima (the ledger was keyed by
          // __sf only), so ~30 queries shipped byte-identical "8-core"
          // timings that were really 32-core ones. Cross-core minima are
          // as meaningless as cross-sf ones — same rule, one more key.
          val cpuStamp = lines.collectFirst { case ("__cpus", v) => v }
          if (!sfStamp.contains(sfDir) || !cpuStamp.contains(cpus)) {
            System.err.println(s"[bench] minima ledger $p is for sf " +
              s"'${sfStamp.getOrElse("<unstamped>")}' cpus " +
              s"'${cpuStamp.getOrElse("<unstamped>")}', this run is " +
              s"'$sfDir' cpus '$cpus' — discarding it " +
              "(cross-sf/cross-cpus minima are meaningless)")
            (Map.empty, 0)
          } else
            (lines.collect { case (k, v) if !k.startsWith("__") =>
              k -> v.toDouble }.toMap, legs)
        } catch { case _: Throwable => (Map.empty, 0) }
      case _ => (Map.empty, 0)
    }

  private def writeMinima(m: Map[String, Double], legs: Int, sfDir: String,
      cpus: String): Unit =
    minimaPath.foreach { p =>
      try {
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        val body = (Seq(s"__legs\t$legs", s"__sf\t$sfDir", s"__cpus\t$cpus") ++
          m.toSeq.sorted.map { case (k, v) => f"$k\t$v%.4f" }).mkString("\n")
        java.nio.file.Files.write(p, body.getBytes("UTF-8"))
      } catch { case _: Throwable => () }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
    // State-store DEFAULT for the registry runs: the HDFS-backed
    // (in-memory) provider, set explicitly (VERDICT r16 #7). Decision
    // basis: the r13 A/B (SCALE.md) measured RocksDB within same-leg
    // noise (±13%) on every streaming row except the churn-heaviest
    // q_stream_join (+18%); RocksDB's value is state LARGER than heap,
    // a regime the sf-scale bench never enters — so the bench defaults
    // to the no-overhead store and keeps RocksDB as the deployment dial.
    // Override for the A/B: SPARK_GRAFT_STATE_STORE=org.apache.spark.sql
    // .execution.streaming.state.RocksDBStateStoreProvider.
    builder.config("spark.sql.streaming.stateStore.providerClass",
      sys.env.getOrElse("SPARK_GRAFT_STATE_STORE",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"))
    val spark = builder
      // streaming state partitions sized to the single-file harness input,
      // not the 32-way batch shuffle width (see EventStreams doc). Default 4
      // by r11 A/B at sf0.1 {2: 2.31 s, 4: 2.61, 8: 3.15 on q_stream_join}
      // and x16 {2: 5.96, 8: 5.38} — 4 is never-worst at every measured
      // rung; override with SPARK_GRAFT_STREAM_PARTS.
      .config("graft.streaming.shufflePartitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Host 1-minute loadavg BEFORE the run: r6's end-only sample could not
    // see contention that hit early queries and cleared before the end.
    // r6 AND the official r7 artifact were both minted on a contended host
    // (sbt wall 1097 s vs 163 s quiet) — so now the bench REFUSES to start
    // while load is high: wait up to `maxWaits` sleeps for the 1-minute
    // loadavg to drop below `maxLoad`. r10's official artifact was minted at
    // loadavg 3.1→8.2 and came out 2.4× slow across UNCHANGED queries — the
    // old 8.0 gate let it through, so the gate is now 2.0: on a 32-cpu host
    // anything above ~2 means another multi-core job is resident and every
    // number is suspect. If it never clears we still run (an artifact with a
    // recorded contention flag beats no artifact), but the JSON carries the
    // decision so a reader can see the numbers are suspect without needing a
    // separate retake log.
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXLOAD", "2.0").toDouble
    val maxWaits = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXWAITS", "10").toInt
    var waits = 0
    while (loadavg1.toDouble > maxLoad && waits < maxWaits) {
      System.err.println(
        f"[bench] loadavg ${loadavg1} > $maxLoad%.1f — waiting 60 s (${waits + 1}/$maxWaits)")
      Thread.sleep(60000)
      waits += 1
    }
    val loadPre = loadavg1
    val contended = loadPre.toDouble > maxLoad

    // Warm-up: absorb JVM/classloader/codegen startup so per-query numbers
    // measure the queries, not session bootstrap (SURVEY.md §6: the real
    // risk at small SF is fixed overhead). Runs the flagship once at the
    // smallest SF, then one tiny scan of the bench dir.
    try {
      SparkEntry.entry(spark).count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    } catch { case _: Throwable => () }

    // Optional args restrict the run to the named queries (tuning loop).
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
      else SparkEntry.queries

    // Named shared-setup warm-ups (see warmupRows doc) — timed and reported
    // as their own rows so the one-time cache builds have a fixed home.
    // Only for FULL-registry runs: arg-restricted runs (tuning loop, the
    // scale-ladder rungs) need cold first-touch numbers, and
    // SPARK_GRAFT_BENCH_WARMUP=0 disables explicitly.
    val doWarm = args.isEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    val warm: Seq[(String, Double)] =
      (if (doWarm) warmupRows.filter(selected.contains) else Seq.empty).map { n =>
        val t0 = System.nanoTime()
        try { materialize(selected(n)(spark, sfDir)); (n, (System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => (n, -1.0) }
      }

    // Host-speed canary (r18): fixed work, measured once per leg before
    // the loop — see cpuCanary doc. Emitted in the summary so cross-round
    // per-row deltas can be normalized by host speed first. (The MEMORY
    // canary is re-measured per attempt inside measureLoop and feeds the
    // pollution verdict — see minMemMBs below.)
    val (canarySingleMs, canaryMultiMs) = cpuCanary(cpus.toInt)
    System.err.println(s"[bench] cpu_canary single=${canarySingleMs} ms multi(${cpus})=${canaryMultiMs} ms")

    // Each query runs `runs` times (default 3); the artifact reports BOTH
    // min (comparable with earlier rounds, robust to one slow pass) and
    // median (robust to one FAST pass / residual cache effects). A
    // transient host-load spike during one pass can't masquerade as a
    // regression. SPARK_GRAFT_BENCH_RUNS overrides.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // (name, per-run times of the runs that SUCCEEDED, count of failed runs)
    // Tuple tail: (gc ms, wall s, steal frac, mem-canary MB/s at attempt start)
    def measureLoop(): (Seq[(String, Seq[Double], Int)], Long, Double, Double, Long) = {
      val memMBs = memCanary()
      System.err.println(s"[bench] mem_canary $memMBs MB/s")
      val gc0 = gcMillis
      val (jt0, js0) = stealSample
      val t0 = System.nanoTime()
      val res = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val times = (1 to runs).flatMap { _ =>
          val tq = System.nanoTime()
          try { materialize(fn(spark, sfDir)); Some((System.nanoTime() - tq) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); None
          }
        }
        (name, times, runs - times.size)
      }
      val (jt1, js1) = stealSample
      val stealFrac =
        if (jt1 > jt0) (js1 - js0).toDouble / (jt1 - jt0) else 0.0
      (res, gcMillis - gc0, (System.nanoTime() - t0) / 1e9, stealFrac, memMBs)
    }
    // Leg-health gate (VERDICT r16 #1): the r16 artifact shipped a leg
    // whose measured loop spent 93% of wall in GC (gc_ms 310.6 s) with
    // per-query noise up to 30× over cross-leg minima, yet stamped
    // contended:false — the pre-run loadavg wait cannot see contention
    // that ARRIVES mid-leg. So the leg now judges ITSELF after running:
    // a loop whose own GC share exceeds maxGcFrac (~3% of wall — the r16
    // healthy leg ran the full registry at 2.7%) or whose pre-loadavg
    // exceeded maxLoadHard is POLLUTED; it is re-run (after re-waiting
    // for quiet) up to legRetries times, the best attempt by total of
    // per-query minima is kept, and if even the best is polluted the
    // artifact says contended:true — an honest flag instead of a silent
    // garbage number.
    val maxGcFrac = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXGCFRAC", "0.03").toDouble
    val maxLoadHard = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXLOADHARD", "4.0").toDouble
    val maxStealFrac = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXSTEAL", "0.05").toDouble
    // retry only on FULL-registry legs: arg-restricted runs (tuning loop,
    // ladder rungs) read per-row numbers and a heavy rung's own GC is
    // workload, not host contention — they still get the honest
    // leg_health record, just no automatic re-run
    val legRetries = if (args.nonEmpty) 0
      else sys.env.getOrElse("SPARK_GRAFT_BENCH_LEGRETRIES", "1").toInt
    def legTotal(r: Seq[(String, Seq[Double], Int)]): Double =
      r.collect { case (_, ts, _) if ts.nonEmpty => ts.min }.sum
    // Memory-bandwidth floor for a believable leg (r18b): the container
    // hit a window where single-thread memcpy read 2.2 GB/s (vs 7.9
    // during this round's legs) and UNCHANGED 1 s queries ran 12-38 s
    // with gc/steal/loadavg ALL green — bandwidth throttling is invisible
    // to every scheduler-side gate, so the leg now judges it directly
    // via the per-attempt stream-sum canary. Applies to arg-restricted
    // runs too (host state, not workload — unlike the gcFrac term).
    val minMemMBs = sys.env.getOrElse("SPARK_GRAFT_BENCH_MINMEM_MBS", "4000").toLong
    def polluted(gcMs: Long, wallS: Double, loadP: Double, steal: Double,
        memMBs: Long): Boolean =
      gcMs > maxGcFrac * wallS * 1000 || loadP > maxLoadHard ||
        steal > maxStealFrac || memMBs < minMemMBs
    var attemptLoadPre = loadPre.toDouble
    var best = measureLoop()
    var bestLoadPre = attemptLoadPre
    var retriesUsed = 0
    def isPolluted(a: (Seq[(String, Seq[Double], Int)], Long, Double, Double, Long),
        lp: Double): Boolean = polluted(a._2, a._3, lp, a._4, a._5)
    while (isPolluted(best, bestLoadPre) && retriesUsed < legRetries) {
      System.err.println(f"[bench] leg POLLUTED (gc_ms=${best._2}, wall=${best._3}%.1f s, " +
        f"loadavg_pre=$bestLoadPre%.1f, steal=${best._4 * 100}%.1f%%) — retrying (${retriesUsed + 1}/$legRetries)")
      var w2 = 0
      while (loadavg1.toDouble > maxLoad && w2 < maxWaits) {
        Thread.sleep(60000); w2 += 1
      }
      attemptLoadPre = loadavg1.toDouble
      val again = measureLoop()
      // a HEALTHY loop beats a polluted one even at a higher total (r17
      // leg 3: the gc-polluted first loop posted lower per-query minima
      // than its clean retry and best-by-total re-selected it, voiding
      // the leg the retry had just rescued); at equal health, FEWER
      // totally-failed queries wins before the minima total does — an
      // attempt that dropped a query posts a strictly smaller total and
      // would otherwise beat a complete attempt, silently losing that
      // query's timings from the leg AND the cross-leg merge (ADVICE r17);
      // only then does the lower minima-total decide
      def attemptKey(a: (Seq[(String, Seq[Double], Int)], Long, Double, Double, Long),
          lp: Double): (Boolean, Int, Double) =
        (isPolluted(a, lp), a._1.count(_._2.isEmpty), legTotal(a._1))
      if (Ordering[(Boolean, Int, Double)].lt(
          attemptKey(again, attemptLoadPre), attemptKey(best, bestLoadPre))) {
        best = again; bestLoadPre = attemptLoadPre
      }
      retriesUsed += 1
    }
    val (results, gcMeasuredLeg, wallMeasured, stealFracLeg, memCanaryMBs) = best
    val legPolluted = isPolluted(best, bestLoadPre)
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Full per-query timings go to stderr (the local tuning loop reads
    // them) INCLUDING every individual run — summaries alone hide which run
    // paid a shared-scan / JIT cost. stdout gets ONE COMPACT JSON line —
    // total over every query, but only the headline per-query maps, rounded
    // — because the driver keeps just the last ~2000 output chars and a
    // line carrying all 110+ queries at full double precision gets
    // truncated past parseability.
    warm.foreach { case (k, t) =>
      System.err.println(f"[bench] warmup:$k%-17s $t%9.3f s")
    }
    results.foreach { case (k, ts, nf) =>
      val runsStr = ts.map(t => f"$t%.3f").mkString("[", ", ", "]")
      val flag = if (ts.isEmpty) "  FAILED"
                 else if (nf > 0) s"  FLAKY($nf/$runs runs failed)" else ""
      val (mn, md) = if (ts.isEmpty) (0.0, 0.0) else (ts.min, median(ts))
      System.err.println(f"[bench] $k%-24s min=$mn%8.3f s  med=$md%8.3f s  runs=$runsStr$flag")
    }
    def r3(v: Double): String = f"$v%.3f"
    def r2(v: Double): String = f"$v%.2f"
    val qs = results.collect { case (k, ts, _) if ts.nonEmpty && Bench.headline(k) =>
      s"\"" + k + "\":" + r3(ts.min)
    }.mkString("{", ",", "}")
    val qsMed = results.collect { case (k, ts, _) if ts.nonEmpty && Bench.headline(k) =>
      s"\"" + k + "\":" + r2(median(ts))
    }.mkString("{", ",", "}")
    val warmJson = warm.map { case (k, t) => s"\"" + k + "\":" + r2(t) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, ts, _) if ts.isEmpty => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    // A query that failed on SOME run but succeeded on another is flaky —
    // previously it silently folded into success; report it separately so
    // nondeterministic failures can't hide behind min-of-N.
    val flaky = results.collect { case (k, ts, nf) if ts.nonEmpty && nf > 0 =>
      s"\"" + k + "\":" + nf
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, ts, _) if ts.nonEmpty => ts.min }.sum
    val totalMed = results.collect { case (_, ts, _) if ts.nonEmpty => median(ts) }.sum
    // Self-diagnosis fields (r11 verdict item #2): GC milliseconds spent
    // inside the measured loop (and process-total), the commit SHA of the
    // measured tree, and the EFFECTIVE shuffle-partition setting — so a
    // cross-round delta can be attributed (host vs GC vs conf) from the
    // artifact alone.
    val gcMeasured = gcMeasuredLeg
    val shufflePartsEff = spark.conf.get("spark.sql.shuffle.partitions")
    // Streaming floor/payload split (VERDICT r16 #4): each q_stream_* row's
    // EMPTY-INPUT wall time (query start/stop, source listing, offset/commit
    // logs, state-store load+commit — Spark-fixed machinery a continuous
    // deployment pays once per micro-batch, not per query) is measured by
    // `StreamOverheadProbe decompose`, which writes the ledger file this
    // reads. Floors are emitted ONLY when the ledger's stream-partition
    // setting matches this run's (the floor scales with state-store
    // instance count, so a SPARK_GRAFT_STREAM_PARTS override would stamp
    // stale floors and negative-clamped payloads — ADVICE r17), and the
    // artifact carries the ledger's age so a different-day floor is
    // visible instead of silently wrong (r17: q_stream_tumbling's merged
    // min undercut a floor measured months of host-drift earlier).
    val streamPartsEff = spark.conf.get("graft.streaming.shufflePartitions", "4")
    val (streamFloor, floorMeta): (Map[String, Double], String) =
      readStreamFloors() match {
        case Some((floors, parts, epochMs)) if parts.toString == streamPartsEff =>
          val ageH = (System.currentTimeMillis() - epochMs) / 3600e3
          (floors, s"""{"parts":$parts,"age_hours":${f"$ageH%.1f"}}""")
        case Some((_, parts, _)) =>
          (Map.empty, s"""{"skipped":"ledger parts $parts != run parts $streamPartsEff"}""")
        case None =>
          (Map.empty, """{"skipped":"no floor ledger (run StreamOverheadProbe decompose)"}""")
      }
    // Cross-leg minima (r14 verdict #6): merge this leg's per-query minima
    // with the round's prior legs, emit the merged HEADLINE map plus a
    // leg-noise band (this leg's min / merged min over headline rows) so a
    // reader can dismiss uniform host inflation without digging in target/.
    // Full-registry runs only — arg-restricted tuning runs are cold-start
    // by design and would poison the minima.
    val legMin: Map[String, Double] =
      results.collect { case (k, ts, _) if ts.nonEmpty => k -> ts.min }.toMap
    val (minAll, nLegs, noiseMed, noiseMax) =
      if (args.nonEmpty) (legMin, 1, 1.0, 1.0)
      else {
        val (prior, priorLegs) = readMinima(sfDir, cpus)
        val merged = mergeMinima(prior, legMin)
        writeMinima(merged, priorLegs + 1, sfDir, cpus)
        val ratios = legMin.collect {
          case (k, v) if headline(k) && merged.get(k).exists(_ > 0) =>
            v / merged(k)
        }.toSeq
        (merged, priorLegs + 1,
          if (ratios.isEmpty) 1.0 else median(ratios),
          if (ratios.isEmpty) 1.0 else ratios.max)
      }
    val qsMinAll = minAll.toSeq.sorted.collect { case (k, v) if headline(k) =>
      s"\"" + k + "\":" + r3(v)
    }.mkString("{", ",", "}")
    val legNoise = s"""{"n_legs":$nLegs,"this_leg_over_min_med":${r2(noiseMed)},"this_leg_over_min_max":${r2(noiseMax)}}"""
    // Final contention verdict: pre-run load OR the leg's own post-hoc
    // health check (GC share / hard load ceiling) — either one voids the
    // leg for cross-round comparison and the artifact must say so.
    // EXCEPT the gc term on arg-restricted runs: a heavy ladder rung's GC
    // share is workload, not host contention (the retry-gating comment
    // above already says so), and stamping a legitimately GC-heavy rung
    // contended:true on a quiet host corrupts the flag downstream tooling
    // gates on (ADVICE r17). Load/steal terms still apply; leg_health
    // keeps the full record either way.
    val legPollutedVerdict =
      if (args.nonEmpty)
        bestLoadPre > maxLoadHard || stealFracLeg > maxStealFrac ||
          memCanaryMBs < minMemMBs
      else legPolluted
    val contendedFinal = contended || legPollutedVerdict
    val gcFrac = if (wallMeasured > 0) gcMeasured / (wallMeasured * 1000) else 0.0
    val legHealth = s"""{"gc_frac":${f"$gcFrac%.4f"},"max_gc_frac":$maxGcFrac,"loadavg_pre":$bestLoadPre,"max_load_hard":$maxLoadHard,"steal_frac":${f"$stealFracLeg%.4f"},"max_steal_frac":$maxStealFrac,"mem_mb_s":$memCanaryMBs,"min_mem_mb_s":$minMemMBs,"retries_used":$retriesUsed,"polluted":$legPolluted,"gc_term_in_verdict":${args.isEmpty}}"""
    val floorJson = streamFloor.toSeq.sorted.collect {
      case (k, f) if legMin.contains(k) => s"\"" + k + "\":" + r3(f)
    }.mkString("{", ",", "}")
    // Payload = this leg's min − the probe's empty-input floor. Floors are
    // min-merged across probe runs, so a merged floor can exceed a slower
    // leg's min; printing 0.000 there asserts a measurement the leg
    // contradicts (VERDICT r18 #5/#9). A clamped row is now emitted as
    // JSON null and named in stream_payload_clamped instead.
    val payloadJson = streamFloor.toSeq.sorted.collect {
      case (k, f) if legMin.contains(k) =>
        val p = legMin(k) - f
        s"\"" + k + "\":" + (if (p < 0) "null" else r3(p))
    }.mkString("{", ",", "}")
    val payloadClamped = streamFloor.toSeq.sorted.collect {
      case (k, f) if legMin.contains(k) && legMin(k) - f < 0 => s"\"" + k + "\""
    }.mkString("[", ",", "]")
    val summary = s"""{"metric":"total","value":${r3(total)},"total_med":${r3(totalMed)},"unit":"sec","n_queries":${results.count(_._2.nonEmpty)},"runs_per_query":$runs,"loadavg_pre":$loadPre,"loadavg":$loadavg1,"load_guard":{"max":$maxLoad,"waits":$waits,"contended":$contendedFinal},"leg_health":$legHealth,"heap_max_gb":${Runtime.getRuntime.maxMemory / (1 << 30)},"gc_ms":$gcMeasured,"gc_ms_total":$gcMillis,"git_sha":"$gitSha","shuffle_partitions":$shufflePartsEff,"cpu_canary":{"single_ms":$canarySingleMs,"multi_ms":$canaryMultiMs,"threads":$cpus,"mem_mb_s":$memCanaryMBs},"warmup":$warmJson,"queries":$qs,"queries_med":$qsMed,"queries_min_all_legs":$qsMinAll,"leg_noise":$legNoise,"stream_floor_meta":$floorMeta,"stream_floor_s":$floorJson,"stream_payload_s":$payloadJson,"stream_payload_clamped":$payloadClamped,"failed":$failed,"flaky":$flaky,"sf":"$sfDir"}"""
    // Complete per-query record to a machine-readable FILE, every leg,
    // unconditionally (VERDICT r18 #1): the stdout compact line carries
    // totals only (the full line outgrows the driver's ~2000-char tail
    // window), which left PERF_r18 with an empty per_query table — every
    // per-query claim rested on builder-side files. This artifact is the
    // driver-facing contract: full min/med maps over EVERY query (not just
    // headline), the cross-leg minima merge, failures, and the leg-health
    // block, so per-query deltas and cross-core scaling are reconstructable
    // from target/ alone. SPARK_GRAFT_BENCH_PERQUERY overrides the path
    // ("none" disables); cpus is in the filename's content, not the path,
    // so a low-core scaling run overwrites honestly rather than mixing.
    val perQueryPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PERQUERY",
      "target/bench_perquery.json")
    if (perQueryPath != "none") {
      try {
        val minJson = results.collect { case (k, ts, _) if ts.nonEmpty =>
          s"\"" + k + "\":" + r3(ts.min) }.mkString("{", ",", "}")
        val medJson = results.collect { case (k, ts, _) if ts.nonEmpty =>
          s"\"" + k + "\":" + r3(median(ts)) }.mkString("{", ",", "}")
        val minAllJson = minAll.toSeq.sorted.map { case (k, v) =>
          s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
        val rec = s"""{"metric":"perquery","value":${r3(total)},"total_med":${r3(totalMed)},"unit":"sec","n_queries":${results.count(_._2.nonEmpty)},"runs_per_query":$runs,"cpus":$cpus,"sf":"$sfDir","git_sha":"$gitSha","epoch_ms":${System.currentTimeMillis()},"n_legs":$nLegs,"contended":$contendedFinal,"leg_health":$legHealth,"warmup":$warmJson,"min":$minJson,"med":$medJson,"min_all_legs":$minAllJson,"stream_floor_meta":$floorMeta,"stream_floor_s":$floorJson,"stream_payload_s":$payloadJson,"stream_payload_clamped":$payloadClamped,"failed":$failed,"flaky":$flaky}"""
        val pp = java.nio.file.Paths.get(perQueryPath)
        if (pp.getParent != null) java.nio.file.Files.createDirectories(pp.getParent)
        java.nio.file.Files.write(pp, rec.getBytes("UTF-8"))
        System.err.println(s"[bench] per-query record written to $perQueryPath")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] per-query record write FAILED: ${e.getMessage}")
      }
    }
    // The summary JSON is emitted on BOTH streams, and on stderr it is the
    // LAST line AFTER the per-query rows: under sbt the stdout println can
    // flush before the buffered stderr block, and a driver that keeps only
    // the final ~2000 chars of interleaved output then sees per-query rows
    // but no summary (exactly how BENCH_r07.json ended up "parsed": null).
    // Emitting it last-on-stderr guarantees the tail always carries it.
    // r12 postmortem: the FULL record itself outgrew the driver's fixed-size
    // tail window (41 headline queries + med/warmup maps pushed it past the
    // capture), truncating `"metric":"total"` mid-line. So a second, COMPACT
    // record — total + the attribution fields only, bounded well under any
    // tail window — is emitted AFTER the full one on both streams. Whatever
    // the window size, the LAST line always parses.
    val compact = s"""{"metric":"total_compact","value":${r3(total)},"total_med":${r3(totalMed)},"unit":"sec","n_queries":${results.count(_._2.nonEmpty)},"n_failed":${results.count(_._2.isEmpty)},"gc_ms":$gcMeasured,"gc_frac":${f"$gcFrac%.4f"},"steal_frac":${f"$stealFracLeg%.4f"},"git_sha":"$gitSha","contended":$contendedFinal,"leg_retries":$retriesUsed,"n_legs":$nLegs,"cpus":$cpus,"perquery_file":"${if (perQueryPath == "none") "" else perQueryPath}","sf":"$sfDir"}"""
    System.err.println(summary)
    System.err.println(compact)
    println(summary)
    println(compact)
    spark.stop()
  }
}
