package graft

import graft.functions.AudioCodec
import graft.operators.{AdvancedQueries, Dedup, QualityChecks, Scoring}
import org.apache.spark.sql.functions._

/** Unit/property coverage for the round-14 continuation operators: audio
  * fingerprint near-dedup, hybrid RRF retrieval, distributed OLS, mutual
  * information. Values at sf0.01 are pinned by the DuckDB oracle (driver
  * t2); these specs pin the SEMANTIC contracts. */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- audio fingerprint near-dedup ----

  test("audioFp: empty on junk, on non-WAV, and on sub-65-frame clips") {
    assert(AudioCodec.audioFp(Array[Byte](1, 2, 3)).numElements() == 0)
    assert(AudioCodec.audioFp(Array.fill[Byte](100)(0x42)).numElements() == 0)
    // synthWav(id=0): 50 frames < 65 windows -> no fingerprint
    assert(AudioCodec.audioFp(AudioCodec.synthWav(0L)).numElements() == 0)
    // the group synth always has 520 frames -> fingerprint present
    assert(AudioCodec.audioFp(AudioCodec.synthWavGroup(0L)).numElements() == 2)
  }

  test("audioFp: one-window loudness edit moves at most 2 bits") {
    def ham(a: Array[Long], b: Array[Long]): Int =
      java.lang.Long.bitCount(a(0) ^ b(0)) + java.lang.Long.bitCount(a(1) ^ b(1))
    for (g <- 0L until 20L) {
      val base = AudioCodec.audioFp(AudioCodec.synthWavGroup(3 * g)).toLongArray()
      val v1 = AudioCodec.audioFp(AudioCodec.synthWavGroup(3 * g + 1)).toLongArray()
      val v2 = AudioCodec.audioFp(AudioCodec.synthWavGroup(3 * g + 2)).toLongArray()
      assert(ham(base, v1) <= 2, s"g=$g base-v1")
      assert(ham(base, v2) <= 2, s"g=$g base-v2")
      assert(ham(v1, v2) <= 4, s"g=$g v1-v2")
    }
  }

  test("hamming64Pairs finds every planted base-variant audio pair") {
    import graft.functions.{GraftFunctions => GFF}
    GFF.register(spark)
    val docs = (0L until 60L).toDF("doc_id")
    val sigs = docs
      .select(col("doc_id"), GFF.audioFp(GFF.synthWavGroup(col("doc_id"))).as("fp"))
      .where(size(col("fp")) === 2)
      .select(col("doc_id"),
        element_at(col("fp"), 1).as("lo"), element_at(col("fp"), 2).as("hi"))
    val pairs = Dedup.hamming64Pairs(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (g <- 0L until 20L) {
      assert(pairs.contains((3 * g, 3 * g + 1)), s"missing base-v1 pair g=$g")
      assert(pairs.contains((3 * g, 3 * g + 2)), s"missing base-v2 pair g=$g")
    }
  }

  // ---- hybrid reciprocal-rank fusion ----

  test("q_hybrid_rrf: rrf recomputes exactly from the emitted ranks") {
    val rows = Scoring.all("q_hybrid_rrf").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val sr = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val dr = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(sr.isDefined || dr.isDefined, "a fused row must come from some leg")
      sr.foreach(v => assert(v >= 1 && v <= 50))
      dr.foreach(v => assert(v >= 1 && v <= 50))
      val expect = BigDecimal(
        sr.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
          dr.map(v => 1.0 / (60 + v)).getOrElse(0.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expect, s"rrf mismatch on doc ${r.getLong(0)}")
      assert(r.getDouble(3) <= prev, "output must be rrf-descending")
      prev = r.getDouble(3)
    }
  }

  // ---- distributed OLS ----

  test("ols: exact fit recovers slope/intercept with r2 = 1") {
    val df = (1L to 100L).map(x => ("a", x, 3 * x + 7)).toDF("g", "x", "y")
    val r = AdvancedQueries.ols(df, "g").collect()(0)
    assert(r.getLong(1) == 100L)
    assert(r.getDouble(2) == 3.0, "slope")
    assert(r.getDouble(3) == 7.0, "intercept")
    assert(r.getDouble(4) == 1.0, "r2")
  }

  test("ols: invariant under repartitioning (order-free exact sums)") {
    val base = (1L to 500L).map(x => ("a", x, x * x % 97)).toDF("g", "x", "y")
    val a = AdvancedQueries.ols(base.repartition(1), "g").collect()(0)
    val b = AdvancedQueries.ols(base.repartition(13), "g").collect()(0)
    assert(a == b, "partial-agg split must not change any output bit")
  }

  // ---- LazyFrame conf hygiene (VERDICT r13 item 9; r15 #4 removed the
  // side effect entirely — the residual wrapper keeps extraction joins
  // single-equi-key, which the strict default accepts) ----

  test("LazyFrame open: no session conf side effect; strict and relaxed " +
      "co-partition settings extract identical rows") {
    val key = "spark.sql.requireAllClusterKeysForCoPartition"
    val before = spark.conf.get(key)
    val lf = graft.core.LazyFrame.parquet(spark,
      s"$sf0/nation.parquet", Seq("n_nationkey"))
    val strict = lf.rowsAt(Seq(3L, 7L, 11L)).collect().map(_.toSeq)
    assert(spark.conf.get(key) == before,
      "open+extract must leave the user's session value untouched")
    try {
      spark.conf.set(key, "false")
      val relaxed = lf.rowsAt(Seq(3L, 7L, 11L)).collect().map(_.toSeq)
      assert(strict.toSeq == relaxed.toSeq)
    } finally spark.conf.set(key, before)
  }

  // ---- robust (median/MAD) outlier gate ----

  test("q_mad_outliers: every emitted row satisfies |mv - med| > 3*mad from its own columns") {
    val rows = QualityChecks.all("q_mad_outliers").fn(spark, sf0).collect()
    assert(rows.nonEmpty, "sf0.001 events should contain at least one robust outlier")
    rows.foreach { r =>
      val mv = r.getLong(2).toDouble
      val med = r.getDouble(3)
      val mad = r.getDouble(4)
      assert(math.abs(mv - med) > 3.0 * mad, s"row $r violates its own gate")
      // medians of integer cents are exact half-integers
      assert(med * 2 == math.rint(med * 2), "median must be a half-integer")
      assert(mad * 2 == math.rint(mad * 2), "MAD must be a half-integer")
    }
  }

  // ---- differentially-private release ----

  test("q_dp_release: noise is bounded by the Laplace tail, deterministic, and nonzero") {
    val out = QualityChecks.all("q_dp_release").fn(spark, sf0).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    val truth = graft.core.Tables.documents(spark, sf0)
      .groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.keySet == truth.keySet)
    // u has 52 uniform bits + the 0.5 offset, so |noise| <= ln(2^53) ~ 36.8
    val maxAbs = math.log(math.pow(2, 53))
    out.foreach { case (lang, noisy) =>
      val noise = noisy - truth(lang)
      assert(math.abs(noise) <= maxAbs, s"$lang noise $noise out of range")
      assert(noise != 0.0, s"$lang got exactly zero noise (hash pole?)")
    }
    val again = QualityChecks.all("q_dp_release").fn(spark, sf0).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(again == out, "release must be bit-replayable")
  }

  // ---- retrieval evaluation ----

  test("q_retrieval_eval: metrics in [0,1]; perfect recall implies MRR 1") {
    val rows = graft.operators.PipelineQueries.all("q_retrieval_eval")
      .fn(spark, sf0).collect()
    assert(rows.length == 10, "one row per query vector")
    rows.foreach { r =>
      val (recall, mrr, ndcg) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(recall >= 0 && recall <= 1, s"recall $recall")
      assert(mrr >= 0 && mrr <= 1, s"mrr $mrr")
      assert(ndcg >= 0 && ndcg <= 1 + 1e-9, s"ndcg $ndcg")
      if (recall == 1.0) assert(mrr == 1.0,
        "if all top-10 are relevant the first certainly is")
      if (recall == 0.0) assert(mrr == 0.0 && ndcg == 0.0)
    }
  }

  // ---- mutual information ----

  test("q_mutual_info: total MI is non-negative and cells cover the corpus") {
    val rows = QualityChecks.all("q_mutual_info").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(4)).sum
    // MI >= 0 exactly; allow only the 9-dp rounding slack times the cells
    assert(total >= -1e-8 * rows.length, s"MI must be non-negative, got $total")
    val n = rows.map(_.getLong(2)).sum
    assert(n == graft.core.Tables.documents(spark, sf0).count())
  }

  // ---- exact-substring excision (Lee et al. dedup, the removal op) ----

  test("q_dedup_substring: arithmetic closes, cleaned text re-tokenizes to " +
      "n_after, and corpus-wide removals equal occurrences minus distinct") {
    import graft.functions.{GraftFunctions => GFF}
    GFF.register(spark)
    val rows = Scoring.all("q_dedup_substring").fn(spark, sf0).collect()
    val docs = graft.core.Tables.documents(spark, sf0)
    assert(rows.length == docs.count(), "every document must pass through")
    rows.foreach { r =>
      val (nb, nr, na) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(na == nb - Scoring.spanLen * nr, s"doc ${r.getLong(0)}")
      val retok = r.getString(4).split("[^a-z0-9]+").count(_.nonEmpty)
      assert(retok == na, s"doc ${r.getLong(0)}: cleaned re-tokenizes to $retok, not $na")
    }
    // corpus-wide: exactly one occurrence of every duplicated span survives,
    // so total removals = span occurrences - distinct span hashes
    val spans = docs
      .select(col("doc_id"), GFF.tokens(col("text")).as("t"))
      .where(size(col("t")) >= Scoring.spanLen)
      .select(explode(transform(
        sequence(lit(0), expr(s"size(t) div ${Scoring.spanLen} - 1")),
        i => GFF.md5Hash60(concat_ws(" ",
          slice(col("t"), i * Scoring.spanLen + 1, lit(Scoring.spanLen)))))).as("h"))
    val occ = spans.count()
    val distinct = spans.select(countDistinct(col("h"))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == occ - distinct)
    assert(occ > distinct, "sf0.001 documents must contain planted duplicate spans")
  }

  test("exciseSpans: equals the brute-force first-occurrence model on " +
      "randomized block corpora") {
    import graft.functions.{GraftFunctions => GFF}
    GFF.register(spark)
    val L = graft.operators.Scoring.spanLen
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      // a small pool of 16-token blocks guarantees cross-doc repeats
      val pool = Vector.fill(6)(Vector.fill(L)("w" + rnd.nextInt(50)))
      val docs = (1L to 30L).map { id =>
        val nBlocks = 1 + rnd.nextInt(4)
        val tail = Vector.fill(rnd.nextInt(L))("t" + rnd.nextInt(50))
        (id, ((1 to nBlocks).flatMap(_ => pool(rnd.nextInt(pool.size))) ++ tail)
          .mkString(" "))
      }
      // brute-force model: first (doc, idx) occurrence of each span survives
      val toks = docs.map { case (id, s) =>
        id -> s.split("[^a-z0-9]+").filter(_.nonEmpty).toVector }.toMap
      val seen = scala.collection.mutable.Set.empty[String]
      val expect = docs.sortBy(_._1).map { case (id, _) =>
        val t = toks(id)
        val removedIdx = (0 until t.length / L).filter { i =>
          val span = t.slice(i * L, i * L + L).mkString(" ")
          if (seen.contains(span)) true else { seen += span; false }
        }.toSet
        val cleaned = t.zipWithIndex
          .filterNot { case (_, p) => removedIdx.contains(p / L) }
          .map(_._1).mkString(" ")
        (id, t.length.toLong, removedIdx.size.toLong,
          t.length.toLong - L * removedIdx.size, cleaned)
      }
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
        .repartition(7) // result must not depend on the physical split
      val got = graft.operators.Scoring.exciseSpans(df, "doc_id", "text")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
      assert(got.toSeq == expect, s"round $round diverged from the model")
    }
  }

  // ---- t-closeness ----

  test("q_t_closeness: emd in [0,1], gate is the exact integer compare") {
    val rows = QualityChecks.all("q_t_closeness").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    val totalN = rows.map(_.getLong(2)).sum // QI groups partition customers
    assert(totalN == graft.core.Tables.customer(spark, sf0).count())
    rows.foreach { r =>
      val (n, emdNum, emd, meets) =
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))
      assert(emd >= 0 && emd <= 1, s"emd $emd")
      assert(emd == emdNum.toDouble / (2.0 * n * totalN), "emd must be the exact ratio")
      assert(meets == (emdNum * 5 <= 2 * n * totalN), "gate must match the integer compare")
    }
  }

  // ---- PCA: exact covariance + power iteration ----

  test("CovAggregator: bit-identical under any partitioning (exact long sums)") {
    import graft.operators.PipelineQueries
    val a = PipelineQueries.all("q_pca_cov").fn(spark, sf0).collect()
    // same data, different physical split: exact integer accumulation
    // means not one bit may move
    val df = graft.core.Tables.embeddings(spark, sf0).repartition(13)
    val buf = df.select(transform(col("embedding"),
        x => floor(x.cast("double") * lit(1048576.0) + lit(0.5)).cast("long")).as("v"))
      .as[Seq[Long]]
      .select(new graft.functions.CovAggregator(64).toColumn).head()
    val n = buf(0)
    a.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      assert(r.getLong(2) == n)
      assert(r.getLong(3) == buf(1 + i), s"s_i at ($i,$j)")
      assert(r.getLong(5) == buf(1 + 64 + i * 64 - i * (i - 1) / 2 + (j - i)),
        s"s_ij at ($i,$j)")
    }
  }

  test("q_pca_cov: diagonal non-negative; q_pca_power: unit norm, " +
      "lambda >= max diagonal variance") {
    import graft.operators.PipelineQueries
    val cov = PipelineQueries.all("q_pca_cov").fn(spark, sf0).collect()
    val diag = cov.filter(r => r.getInt(0) == r.getInt(1)).map(_.getDouble(6))
    assert(diag.forall(_ >= 0), "variances must be non-negative")
    val pw = PipelineQueries.all("q_pca_power").fn(spark, sf0).collect()
    assert(pw.length == 64)
    val norm2 = pw.map(r => r.getDouble(1) * r.getDouble(1)).sum
    assert(math.abs(norm2 - 1.0) < 1e-6, s"loading norm^2 $norm2")
    val lam = pw.head.getDouble(2)
    assert(pw.forall(_.getDouble(2) == lam), "eigval replicated per row")
    // for symmetric PSD C, lambda_max >= every diagonal entry
    assert(lam >= diag.max - 1e-9, s"lambda $lam < max variance ${diag.max}")
  }

  test("q_pca_project: the projected variance IS the top eigenvalue") {
    import graft.operators.PipelineQueries
    val lam = PipelineQueries.all("q_pca_power").fn(spark, sf0)
      .collect().head.getDouble(2)
    val p = PipelineQueries.all("q_pca_project").fn(spark, sf0)
      .collect().map(_.getDouble(1))
    val mean = p.sum / p.length
    val varP = p.map(x => (x - mean) * (x - mean)).sum / p.length
    // Var(pc1) is the Rayleigh quotient v'Cv; the reported lambda is
    // ||Cv|| which upper-bounds it until power iteration fully converges
    // (plus ~1e-6 quantized-vs-raw slack). Both directions tie the three
    // PCA queries to one another.
    assert(varP <= lam + 1e-6, s"Rayleigh bound: Var(pc1)=$varP > lambda=$lam")
    assert(lam - varP < 5e-3 * lam,
      s"convergence: Var(pc1)=$varP too far below lambda=$lam")
  }

  test("q_pca_top2: first component matches q_pca_power; components " +
      "orthogonal; spectrum ordered") {
    import graft.operators.PipelineQueries
    val t2 = PipelineQueries.all("q_pca_top2").fn(spark, sf0).collect()
    val pw = PipelineQueries.all("q_pca_power").fn(spark, sf0).collect()
    assert(t2.length == 64)
    t2.zip(pw).foreach { case (a, b) =>
      assert(a.getDouble(1) == b.getDouble(1), s"l1 vs loading at i=${a.getInt(0)}")
    }
    assert(t2.head.getDouble(3) == pw.head.getDouble(2), "e1 == eigval")
    val dot = t2.map(r => r.getDouble(1) * r.getDouble(2)).sum
    assert(math.abs(dot) < 1e-5, s"v1.v2 = $dot not orthogonal")
    assert(t2.head.getDouble(4) <= t2.head.getDouble(3) + 1e-9,
      "second eigenvalue cannot exceed the first")
  }

  test("q_pca_incr: base+delta merge is bit-identical to the monolithic pass") {
    import graft.operators.PipelineQueries
    val incr = PipelineQueries.all("q_pca_incr").fn(spark, sf0).collect()
    val mono = PipelineQueries.all("q_pca_cov").fn(spark, sf0).collect()
    assert(incr.length == mono.length)
    incr.zip(mono).foreach { case (a, b) =>
      assert(a == b, s"incremental and monolithic diverge at (${a.getInt(0)},${a.getInt(1)})")
    }
  }

  test("q_embed_outliers: distances positive and descending; the top-20 cut " +
      "dominates the non-emitted corpus") {
    import graft.operators.PipelineQueries
    val out = PipelineQueries.all("q_embed_outliers").fn(spark, sf0).collect()
    assert(out.length == 20)
    val ds = out.map(_.getDouble(1))
    assert(ds.forall(_ > 0))
    assert(ds.sameElements(ds.sortBy(-_)), "must be emitted far-first")
    // E[d^2] over the corpus is exactly dim for diagonal Mahalanobis, so
    // the far tail must sit well above it
    assert(ds.head > 64.0, s"top outlier ${ds.head} should exceed E[d^2]=dim")
  }

  // ---- cluster-balanced sampling ----

  test("q_sample_cluster: every cell contributes min(32, |cell|), ranks dense") {
    import graft.operators.PipelineQueries
    val sel = PipelineQueries.all("q_sample_cluster").fn(spark, sf0).collect()
    val byCell = sel.groupBy(_.getInt(0))
    val cellSizes = graft.operators.KMeansQuant
      .fit(graft.core.Tables.embeddings(spark, sf0), "vec_id", "embedding", 8, 2)
      .groupBy("cid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    cellSizes.foreach { case (cid, n) =>
      val got = byCell.get(cid).map(_.length).getOrElse(0)
      assert(got == math.min(32L, n), s"cell $cid: $got of $n")
    }
    byCell.values.foreach { rows =>
      val rks = rows.map(_.getLong(1)).sorted
      assert(rks.sameElements(1L to rks.length), "ranks must be dense 1..k")
    }
  }

  test("q_cusum: the recurrence replays exactly from the emitted rows") {
    import graft.operators.QualityChecks
    val rows = QualityChecks.all("q_cusum").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    val k = rows.head.getLong(2)
    assert(rows.forall(_.getLong(2) == k))
    var s = 0L
    rows.foreach { r =>
      s = math.max(0L, s + (r.getLong(1) - k))
      assert(r.getLong(3) == s, s"cusum diverges at day ${r.getLong(0)}")
      assert(r.getBoolean(4) == (s > 2 * k))
    }
    assert(rows.exists(_.getLong(3) == 0L) || rows.head.getLong(1) > k,
      "a mean-centered series must touch zero unless it opens above target")
  }

  test("q_calibration_ece: bins partition the scored corpus, terms " +
      "non-negative, ECE bounded by 1") {
    val rows = Scoring.all("q_calibration_ece").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    val scored = graft.core.Tables.documents(spark, sf0)
      .where(size(graft.functions.GraftFunctions.tokens(col("text"))) > 0).count()
    assert(rows.map(_.getLong(1)).sum == scored)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
      assert(r.getDouble(5) >= 0)
    }
    val ece = rows.map(_.getDouble(5)).sum
    assert(ece >= 0 && ece <= 1, s"ECE $ece out of range")
  }

  test("q_calibration_isotonic: fitted rates nondecreasing, blocks conserve " +
      "mass, and fit equals pooled empirical rate per block") {
    val rows = Scoring.all("q_calibration_isotonic").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    val rates = rows.map(r => (r.getLong(3).toDouble, r.getLong(4).toDouble))
      .map { case (num, den) => num / den }
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b },
      "PAVA output must be nondecreasing")
    // each block's (cal_num, cal_den) must equal the sum of its bins'
    // (pos, n) — mass conservation
    rows.groupBy(r => (r.getLong(3), r.getLong(4))).foreach {
      case ((num, den), bs) =>
        assert(bs.map(_.getLong(1)).sum == den, s"block den $den")
        assert(bs.map(_.getLong(2)).sum == num, s"block num $num")
    }
  }

  test("q_ts_holt: recurrence replays exactly per user; constant series " +
      "has zero trend") {
    import graft.operators.TimeSeries
    val rows = TimeSeries.all("q_ts_holt").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (uid, rs0) =>
      val rs = rs0.sortBy(_.getString(1))
      var l = rs.head.getDouble(2); var b = 0.0
      assert(rs.head.getDouble(3) == l && rs.head.getDouble(4) == 0.0)
      rs.tail.foreach { r =>
        val x = r.getDouble(2)
        val l1 = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (l1 - l) + 0.5 * b
        l = l1
        assert(r.getDouble(3) == l && r.getDouble(4) == b,
          s"user $uid day ${r.getString(1)} diverges")
        assert(r.getDouble(5) == l + b, "forecast = level + trend")
      }
    }
    // synthetic constant series: level locks to the constant, trend to 0
    import spark.implicits._
    val const = (1 to 10).map(i => (1L, f"2024-01-$i%02d", 5.0))
      .toDF("user_id", "day", "v")
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("s"))
      .withColumn("e", expr(
        """aggregate(s, cast(array() as array<struct<l:double,b:double>>), (acc, x) ->
          |  case when size(acc) = 0
          |       then array(named_struct('l', cast(x.v as double), 'b', 0.0D))
          |       else array_append(acc, named_struct(
          |         'l', 0.5D * x.v + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b),
          |         'b', 0.5D * ((0.5D * x.v + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b))
          |                      - element_at(acc, -1).l)
          |              + 0.5D * element_at(acc, -1).b)) end)""".stripMargin))
      .select(explode(col("e")).as("e")).collect()
    const.foreach { r =>
      assert(r.getStruct(0).getDouble(0) == 5.0 && r.getStruct(0).getDouble(1) == 0.0,
        "constant input must hold level=const, trend=0 exactly")
    }
  }

  // ---- A/B experiment readout ----

  test("q_ab_test: buckets partition the users, z recomputes from the " +
      "emitted counts, gate consistent") {
    import graft.operators.EventLifecycle
    val r = EventLifecycle.all("q_ab_test").fn(spark, sf0).collect()
    assert(r.length == 1)
    val (n0, c0, n1, c1) = (r(0).getLong(0), r(0).getLong(1),
      r(0).getLong(2), r(0).getLong(3))
    val users = graft.core.Tables.events(spark, sf0)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(n0 + n1 == users, "variants must partition the user population")
    assert(c0 <= n0 && c1 <= n1 && c0 + c1 > 0 && c0 + c1 < n0 + n1,
      "conversion must be non-degenerate on the harness corpus")
    val (p0, p1) = (c0.toDouble / n0, c1.toDouble / n1)
    val pp = (c0 + c1).toDouble / (n0 + n1)
    val z = (p1 - p0) / math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
    assert(math.abs(r(0).getDouble(6) - z) < 1e-6, "z must recompute from counts")
    assert(r(0).getBoolean(7) == (math.abs(r(0).getDouble(6)) > 1.96))
  }

  test("q_ab_cuped: adjustment preserves the pooled mean and lift closes") {
    import graft.operators.EventLifecycle
    val r = EventLifecycle.all("q_ab_cuped").fn(spark, sf0).collect()
    assert(r.length == 1)
    val (n0, n1) = (r(0).getLong(0), r(0).getLong(1))
    val (y0, y1) = (r(0).getDouble(3), r(0).getDouble(4))
    val (a0, a1) = (r(0).getDouble(5), r(0).getDouble(6))
    assert(!r(0).getDouble(2).isNaN && !r(0).getDouble(2).isInfinite, "theta finite")
    // CUPED is mean-preserving over the POOLED population: sum(x - xbar)
    // over all users is 0, so n0*adj0 + n1*adj1 == n0*y0 + n1*y1 up to
    // the 6-dp emission rounding
    val tol = (n0 + n1) * 5e-7 + 1e-9
    assert(math.abs((n0 * a0 + n1 * a1) - (n0 * y0 + n1 * y1)) <= tol,
      s"pooled mean must be preserved: adj=${n0 * a0 + n1 * a1} raw=${n0 * y0 + n1 * y1}")
    assert(math.abs(r(0).getDouble(7) - (a1 - a0)) <= 2e-6, "lift = adj1 - adj0")
  }

  // ---- Jensen-Shannon drift ----

  test("q_js_drift: per-bin terms non-negative, total bounded by ln 2") {
    val rows = QualityChecks.all("q_js_drift").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(3), "JS is finite on one-sided bins — no NULL terms")
      assert(r.getDouble(3) >= -1e-6, s"bin ${r.getLong(0)}: term must be >= 0")
    }
    val total = rows.map(_.getDouble(3)).sum
    assert(total >= 0 && total <= math.log(2.0) + 1e-6,
      s"total JS $total out of [0, ln 2]")
  }
}
