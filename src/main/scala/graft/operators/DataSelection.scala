package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling") — north-star extension:
  * pick raw-corpus documents whose hashed n-gram distribution looks like a
  * small high-quality target corpus.
  *
  * Model: bag of hashed bigram features (md5-60 of the 2-gram string,
  * bucketed mod [[DataSelection.B]]). Both the target and raw corpora fit
  * add-1-smoothed unigram-over-bucket models; a document's log importance
  * weight is Σ_grams λ_{bucket(gram)} with
  * λ_b = ln((n_t(b)+1)/(N_t+B)) − ln((n_r(b)+1)/(N_r+B)).
  * Selection is Gumbel-top-k over logw + g_i, with the Gumbel noise derived
  * from the deterministic md5-60 rank hash (same salt machinery as
  * [[Sampling]]) instead of an RNG — so the selected set is reproducible
  * across runs, task retries and engines, and the DuckDB oracle replays the
  * whole algorithm: grams, buckets, counts, λ, noise, ranking.
  *
  * Scale shape (the 100 TB story):
  *   - FIT is one narrow aggregation: explode grams → groupBy (side,
  *     bucket) — partial map-side combine collapses every task's output to
  *     ≤ 2·B rows before the exchange, and the driver collects a ≤ 2·B-row
  *     table (bounded by the bucket count, never by rows — same contract as
  *     [[Curation.mixDomains]]' per-source counts).
  *   - SCORING is a pure scan: λ ships as a 256-double literal inside the
  *     plan and [[graft.functions.TextHashes.bucketFold]] folds each row's
  *     gram hashes through it in one codegen loop — zero shuffle, zero
  *     joins, embarrassingly parallel.
  *   - SELECTION is top-k by score: TakeOrdered (per-partition heaps + a
  *     k-row driver merge), never a global sort.
  */
object DataSelection {

  /** Feature-hash bucket count. 2^8 keeps the fitted model a plan literal;
    * a production run would raise it (DSIR uses 10^4) — the shapes above
    * are unchanged, only the literal grows. */
  val B = 256

  /** The stand-in "high-quality target" corpus: src0/src1 (the same two
    * sources [[Curation.targetMix]] concentrates on). */
  val targetSources: Seq[String] = Seq("src0", "src1")

  private val TWO60 = 1152921504606846976.0

  private val lamCache = new graft.core.SessionCache[Array[Double]]

  /** Positional bigram md5-60 hashes (with duplicates — DSIR is a COUNT
    * model, so repeated grams weigh repeatedly). */
  private def bigramHashes(text: Column): Column =
    gramHashes60(tokens(text), 2)

  /** Fit the per-bucket log-likelihood-ratio table from exact integer
    * counts. One narrow aggregation; the collect is bounded by 2·B rows. */
  def fitLambdas(docs: DataFrame, textCol: String, targetPred: Column): Array[Double] = {
    GraftFunctions.register(docs.sparkSession)
    val counts = docs
      .select(targetPred.as("tgt"), explode(bigramHashes(col(textCol))).as("h"))
      .groupBy(col("tgt"), pmod(col("h"), lit(B.toLong)).as("b")).count()
      .collect().map(r => (r.getBoolean(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    val nt = counts.collect { case ((true, _), c) => c }.sum
    val nr = counts.collect { case ((false, _), c) => c }.sum
    // identical op order to the oracle: (c+1) long add → toDouble,
    // (N+B) long add → toDouble, one IEEE divide, ln, one IEEE subtract
    Array.tabulate(B) { b =>
      math.log((counts.getOrElse((true, b), 0L) + 1L).toDouble / (nt + B.toLong).toDouble) -
        math.log((counts.getOrElse((false, b), 0L) + 1L).toDouble / (nr + B.toLong).toDouble)
    }
  }

  private def lamFor(s: SparkSession, d: String): Array[Double] =
    lamCache.getOrElseUpdate(s, s"dsir:$d") {
      fitLambdas(Tables.documents(s, d), "text",
        col("source").isin(targetSources: _*))
    }

  /** Per-document log importance weight over the raw (non-target) corpus:
    * the fitted λ table inlined as a literal, folded per row in codegen —
    * the zero-shuffle scoring scan. */
  def importanceWeights(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val lamLit = array(lamFor(s, d).map(lit(_)).toSeq: _*)
    // two projections so the gram-hash kernel runs ONCE per row
    // (CollapseProject keeps non-cheap expressions from being inlined
    // twice); size + fold then read the same array
    Tables.documents(s, d)
      .where(!col("source").isin(targetSources: _*))
      .select(col("doc_id"), bigramHashes(col("text")).as("h"))
      .select(col("doc_id"),
        size(col("h")).cast("long").as("n_feats"),
        round(bucketFold(col("h"), lamLit), 6).as("logw"))
  }

  /** Gumbel-top-k importance resample: key_i = logw_i + Gumbel(u_i) with
    * u_i = (rank_hash_i + 1) / 2^60 — deterministic, engine-replayable.
    * Top-k by key is TakeOrdered, never a global sort. */
  def resample(s: SparkSession, d: String, k: Int): DataFrame = {
    GraftFunctions.register(s)
    val lamLit = array(lamFor(s, d).map(lit(_)).toSeq: _*)
    val u = (Sampling.rankHash(col("doc_id"), "dsir") + lit(1L)).cast("double") / lit(TWO60)
    Tables.documents(s, d)
      .where(!col("source").isin(targetSources: _*))
      .select(col("doc_id"),
        round(bucketFold(bigramHashes(col("text")), lamLit) - log(-log(u)), 6).as("skey"))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(k)
  }

  /** Deterministic train/valid/test assignment: the salted md5-60 rank
    * hash (same machinery as [[Sampling]]) against cumulative-rate
    * cutoffs. Zero shuffle — a pure codegen scan projection, so the
    * assignment is reproducible across runs, task retries, repartitioning
    * and engines (unlike `randomSplit`, whose draw is per-partition), and
    * a row can never land in two splits. Cutoffs are computed ONCE here
    * and inlined so both engines compare the identical integer literal. */
  def splitAssign(df: DataFrame, idCol: String, trainFrac: Double,
      validFrac: Double, salt: String = "split"): DataFrame = {
    require(trainFrac >= 0 && validFrac >= 0 && trainFrac + validFrac <= 1.0)
    GraftFunctions.register(df.sparkSession)
    val h = Sampling.rankHash(col(idCol), salt)
    df.withColumn("split",
      when(h < lit(Sampling.threshold(trainFrac)), "train")
        .when(h < lit(Sampling.threshold(trainFrac + validFrac)), "valid")
        .otherwise("test"))
  }

  /** DuckDB token split (same regex contract as [[GraftFunctions.tokens]]). */
  private val tokSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Shared oracle CTE chain: grams → buckets → per-side counts → λ →
    * per-doc raw-corpus scores. */
  private val fitSql =
    s"""WITH toks AS (SELECT doc_id, source, $tokSql AS t FROM documents),
       |g AS (SELECT doc_id, source,
       |        ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 15))::BIGINT % 256 AS b
       |      FROM (SELECT doc_id, source, t,
       |              unnest(range(1, greatest(len(t)-1, 0)+1)) AS i FROM toks)),
       |tc AS (SELECT b, count(*)::BIGINT AS c FROM g
       |       WHERE source IN ('src0','src1') GROUP BY 1),
       |rc AS (SELECT b, count(*)::BIGINT AS c FROM g
       |       WHERE source NOT IN ('src0','src1') GROUP BY 1),
       |tot AS (SELECT (SELECT COALESCE(sum(c), 0) FROM tc) AS nt,
       |               (SELECT COALESCE(sum(c), 0) FROM rc) AS nr),
       |lam AS (SELECT bb.b,
       |          ln((COALESCE(tc.c, 0)+1)::DOUBLE / (tot.nt+256)::DOUBLE)
       |          - ln((COALESCE(rc.c, 0)+1)::DOUBLE / (tot.nr+256)::DOUBLE) AS l
       |        FROM (SELECT unnest(range(0, 256)) AS b) bb
       |        LEFT JOIN tc ON bb.b = tc.b LEFT JOIN rc ON bb.b = rc.b
       |        CROSS JOIN tot),
       |sc AS (SELECT g.doc_id, count(*)::BIGINT AS n_feats, sum(lam.l) AS s
       |       FROM g JOIN lam ON g.b = lam.b
       |       WHERE g.source NOT IN ('src0','src1') GROUP BY 1)""".stripMargin

  /** Greedy k-center CORESET selection (farthest-point traversal) over
    * the integer-quantized embedding lattice — the diversity-sampling
    * counterpart of importance resampling: pick `k` exemplars such that
    * every vector is close to some exemplar (a 2-approximation of the
    * optimal k-center cover, Gonzalez 1985). Deterministic: seeded at the
    * minimum vec_id, each step broadcasts the ≤ k chosen centers, ONE
    * partial-aggregated scan computes every vector's min squared-L2 to
    * the chosen set (exact int64 on the [[KMeansQuant.quantize]] lattice)
    * and a TakeOrdered(1) picks the farthest (ties by vec_id). Driver
    * state: k (id, radius²) rows. The emitted `dmin` (the selected
    * point's distance at selection = the cover radius² before it joined)
    * is MONOTONE NON-INCREASING — the classic k-center certificate, and
    * what the spec locks. At 100 TB each step is an embarrassingly
    * parallel scan; k is small by construction.
    *
    * `scale` bound: distances are exact while every squared-L2 on the
    * quantized lattice fits int64 — with d dims and coordinates in
    * [-m, m], dmin ≤ d·(2·m·scale)², so 64 dims of unit-range floats at
    * the default scale=1000 stay below ~2.6e8, far inside the domain.
    * The differential ORACLE key (q_sample_coreset) is lpad-19 over the
    * int64-max complement, so it covers the FULL int64 range of dmin and
    * vec_id (ADVICE r15: the earlier 12-digit field silently corrupted
    * ordering past 1e12). */
  def kCenterCoreset(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, scale: Int = 1000): DataFrame = {
    val spark = emb.sparkSession
    val q = KMeansQuant.quantize(emb, idCol, vecCol, scale).persist()
    try {
      val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var centers = Seq(q.agg(min("vec_id")).collect()(0).getLong(0))
      chosen += ((1L, centers.head, 0L))
      for (step <- 2 to k) {
        // chosen-center vectors fold into ONE broadcast array column and
        // the min-distance runs inline per row (the r18 broadcast-codebook
        // fold, see KMeansQuant.assign): no n×|centers| expansion, no
        // vec_id-keyed exchange — each greedy step is a scan + a 1-row
        // TakeOrdered. Fold order is irrelevant (min is commutative), so
        // plain collect_list keeps the step deterministic.
        val cents = q.where(col("vec_id").isin(centers: _*))
          .agg(collect_list(col("v")).as("cbk"))
        val far = q.crossJoin(broadcast(cents))
          .select(col("vec_id"),
            aggregate(col("cbk"), lit(Long.MaxValue),
              (acc, cv) => least(acc, KMeansQuant.sqDist(col("v"), cv))).as("dmin"))
          .orderBy(col("dmin").desc, col("vec_id"))
          .limit(1).collect()(0)
        centers = centers :+ far.getLong(0)
        chosen += ((step.toLong, far.getLong(0), far.getLong(1)))
      }
      import spark.implicits._
      chosen.toSeq.toDF("step", "vec_id", "dmin")
    } finally { q.unpersist(); () }
  }

  val all: Map[String, Q] = Map(

    // -- greedy k-center coreset (r15): 8 maximally-diverse exemplars —
    //    the diversity-sampling complement of DSIR; exact int64 lattice
    //    distances, deterministic seed/tie-breaks, driver holds k rows.
    //    The oracle replays the WHOLE greedy loop in one recursive CTE
    //    (corpus as a struct list, chosen set carried as an id list,
    //    argmax via the lpad-sortable-key trick — the q_bpe_train
    //    discipline). --
    "q_sample_coreset" -> Q(
      (s, d) => kCenterCoreset(Tables.embeddings(s, d), "vec_id", "embedding", 8)
        .orderBy("step"),
      """WITH RECURSIVE qv AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        |  FROM embeddings),
        |c AS (SELECT list({'id': vec_id, 'v': v} ORDER BY vec_id) AS vs FROM qv),
        |rec(step, ids, pick, dm) AS (
        |  SELECT 1, [s], s, 0::BIGINT
        |  FROM (SELECT min(vec_id) AS s FROM qv)
        |  UNION ALL
        |  SELECT r.step + 1,
        |    list_append(r.ids, substr(bk, 20)::BIGINT),
        |    substr(bk, 20)::BIGINT,
        |    9223372036854775807 - substr(bk, 1, 19)::BIGINT
        |  FROM (
        |    SELECT r.step, r.ids,
        |      (list_sort(list_transform(c.vs, e ->
        |        lpad((9223372036854775807 - list_aggregate(list_transform(r.ids, cid ->
        |          list_sum(list_transform(range(1, len(e.v) + 1), i ->
        |            (e.v[i] - list_filter(c.vs, z -> z.id = cid)[1].v[i])
        |            * (e.v[i] - list_filter(c.vs, z -> z.id = cid)[1].v[i])))
        |        ), 'min'))::VARCHAR, 19, '0') || lpad(e.id::VARCHAR, 19, '0'))))[1] AS bk
        |    FROM rec r, c WHERE r.step < 8) r)
        |SELECT step::BIGINT AS step, pick AS vec_id, dm AS dmin
        |FROM rec ORDER BY step""".stripMargin),

    // -- CURRICULUM ordering (r15): the easy→hard training order — docs
    //    staged into difficulty quartiles (token count as the proxy) and
    //    deterministically shuffled WITHIN each stage, the standard
    //    curriculum-learning data layout. No global sort exists anywhere:
    //    quartile cuts come from the histogram-exact nearest-rank pick
    //    (cumulative window over DISTINCT lengths — bounded by the length
    //    domain, the q_latency_percentiles shape), the within-stage
    //    shuffle key is the md5-60 rank hash (reproducible, oracle-
    //    replayable), and the global sequence number is the
    //    q_pack_sequences two-phase prefix sum over (stage, skey-range)
    //    partitions — 128 bounded offsets broadcast back, so the total
    //    order materializes with NO single-partition exchange over docs.
    //    The oracle replays the same cuts and ONE row_number over
    //    (stage, skey, doc_id) — certifying the distributed order equals
    //    the global sort it avoids. --
    "q_curriculum" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        GraftFunctions.register(s)
        val t = Tables.documents(s, d).select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_toks"),
          md5Hash60(concat(lit("cur_"), col("doc_id").cast("string"))).as("skey"))
        val n = t.count()
        def target(num: Long, den: Long) = (n * num + den - 1) / den
        val hist = t.groupBy("n_toks").agg(count(lit(1)).as("c"))
        val wc = Window.orderBy(col("n_toks")) // over DISTINCT lengths: domain-bounded
        val cuts = hist.withColumn("cum", sum(col("c")).over(wc))
          .agg(min(when(col("cum") >= target(1, 4), col("n_toks"))).as("q1"),
            min(when(col("cum") >= target(2, 4), col("n_toks"))).as("q2"),
            min(when(col("cum") >= target(3, 4), col("n_toks"))).as("q3"))
          .collect()(0)
        val staged = t.withColumn("stage",
          when(col("n_toks") <= cuts.getLong(0), 1L)
            .when(col("n_toks") <= cuts.getLong(1), 2L)
            .when(col("n_toks") <= cuts.getLong(2), 3L)
            .otherwise(4L))
        // two-phase global sequence: pid = (stage, top-5-bits-of-skey)
        val withPid = staged
          .withColumn("pid",
            ((col("stage") - 1) * 32 + shiftright(col("skey"), 55)).cast("int"))
        val totals = withPid.groupBy("pid").agg(count(lit(1)).as("tot"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val pids = 0 to 128
        val offs = pids.scanLeft(0L)((a, p) => a + totals.getOrElse(p, 0L))
        val offsDf = s.createDataFrame(pids.map(p => (p, offs(p))))
          .toDF("pid", "poff")
        val wp = Window.partitionBy(col("pid")).orderBy(col("skey"), col("doc_id"))
        withPid
          .withColumn("rn", row_number().over(wp))
          .join(broadcast(offsDf), "pid")
          .select(col("doc_id"), col("stage"), col("n_toks"),
            (col("poff") + col("rn")).as("seq"))
          .orderBy("doc_id")
      },
      s"""WITH t AS (
         |  SELECT doc_id, len($tokSql)::BIGINT AS n_toks,
         |    ('0x' || substr(md5('cur_' || doc_id::VARCHAR), 1, 15))::BIGINT AS skey
         |  FROM documents),
         |nn AS (SELECT count(*)::BIGINT AS n FROM t),
         |hist AS (SELECT n_toks, count(*)::BIGINT AS c FROM t GROUP BY 1),
         |cum AS (SELECT n_toks, sum(c) OVER (ORDER BY n_toks) AS cum FROM hist),
         |cuts AS (SELECT
         |    min(CASE WHEN cum >= (SELECT (n * 1 + 3) // 4 FROM nn) THEN n_toks END) AS q1,
         |    min(CASE WHEN cum >= (SELECT (n * 2 + 3) // 4 FROM nn) THEN n_toks END) AS q2,
         |    min(CASE WHEN cum >= (SELECT (n * 3 + 3) // 4 FROM nn) THEN n_toks END) AS q3
         |  FROM cum),
         |staged AS (
         |  SELECT doc_id, n_toks, skey,
         |    CASE WHEN n_toks <= q1 THEN 1 WHEN n_toks <= q2 THEN 2
         |         WHEN n_toks <= q3 THEN 3 ELSE 4 END::BIGINT AS stage
         |  FROM t CROSS JOIN cuts)
         |SELECT doc_id, stage, n_toks,
         |  row_number() OVER (ORDER BY stage, skey, doc_id) AS seq
         |FROM staged ORDER BY doc_id""".stripMargin),

    // -- DSIR importance weights: the full differential oracle rebuilds
    //    the hashed-bigram buckets, both smoothed models and every λ from
    //    the same exact integer counts, then re-scores every raw doc.
    //    round-6 absorbs summation-order and last-ulp-ln differences
    //    (error ~1e-13 per doc, five orders under the tolerance). --
    "q_dsir_weights" -> Q(
      (s, d) => importanceWeights(s, d).orderBy("doc_id"),
      s"""$fitSql
         |SELECT d.doc_id, COALESCE(sc.n_feats, 0)::BIGINT AS n_feats,
         |  round(COALESCE(sc.s, 0.0), 6) AS logw
         |FROM documents d LEFT JOIN sc USING (doc_id)
         |WHERE d.source NOT IN ('src0','src1') ORDER BY doc_id""".stripMargin),

    // -- Gumbel-top-k importance resample (k = 100): the oracle replays
    //    the md5-60 rank hash, the exact (h+1)/2^60 uniform, the Gumbel
    //    transform and the (skey DESC, doc_id) ranking. --
    "q_dsir_sample" -> Q(
      (s, d) => resample(s, d, 100),
      s"""$fitSql
         |SELECT doc_id, skey FROM (
         |  SELECT d.doc_id,
         |    round(COALESCE(sc.s, 0.0)
         |      - ln(-ln((('0x' || substr(md5('dsir_' || d.doc_id::VARCHAR), 1, 15))::BIGINT + 1)::DOUBLE
         |               / 1152921504606846976.0)), 6) AS skey
         |  FROM documents d LEFT JOIN sc USING (doc_id)
         |  WHERE d.source NOT IN ('src0','src1'))
         |ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin),

    // -- deterministic 80/10/10 corpus split: the oracle replays hash and
    //    cutoffs exactly, so every row's assignment is checked. --
    "q_split_assign" -> Q(
      (s, d) => splitAssign(Tables.documents(s, d), "doc_id", 0.8, 0.1)
        .select("doc_id", "split").orderBy("doc_id"),
      s"""SELECT doc_id,
         |  CASE WHEN ('0x' || substr(md5('split_' || doc_id::VARCHAR), 1, 15))::BIGINT
         |            < ${Sampling.threshold(0.8)} THEN 'train'
         |       WHEN ('0x' || substr(md5('split_' || doc_id::VARCHAR), 1, 15))::BIGINT
         |            < ${Sampling.threshold(0.8 + 0.1)} THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin),

    // -- split balance audit: per (split, lang) counts — the check a
    //    pipeline runs before trusting a split didn't skew a stratum. --
    "q_split_balance" -> Q(
      (s, d) => splitAssign(Tables.documents(s, d), "doc_id", 0.8, 0.1)
        .groupBy("split", "lang").count().withColumnRenamed("count", "n")
        .orderBy("split", "lang"),
      s"""SELECT CASE WHEN ('0x' || substr(md5('split_' || doc_id::VARCHAR), 1, 15))::BIGINT
         |            < ${Sampling.threshold(0.8)} THEN 'train'
         |       WHEN ('0x' || substr(md5('split_' || doc_id::VARCHAR), 1, 15))::BIGINT
         |            < ${Sampling.threshold(0.8 + 0.1)} THEN 'valid'
         |       ELSE 'test' END AS split,
         |  lang, count(*)::BIGINT AS n
         |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin)
  )
}
