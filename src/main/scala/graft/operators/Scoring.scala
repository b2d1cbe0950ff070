package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Document scoring / retrieval operators (north-star extension, round 12):
  * the ranking and model-scoring steps between curation and training.
  *
  *   - BM25: classic sparse retrieval over the corpus for a fixed query —
  *     one scan computes per-doc term frequencies, ONE tiny aggregate
  *     yields the global stats (N, avgdl, per-term df), and the stats
  *     frame broadcasts back over the scan (never a shuffle on the
  *     corpus). Top-k by score is a TakeOrdered, not a global sort.
  *   - hashed linear quality classifier: the fastText-style shape — a
  *     deterministic weight table addressed by token-hash bucket, applied
  *     as an ORDERED per-row fold (so the float sum is bit-identical in
  *     any engine that replays the same order, which the DuckDB oracle
  *     does via `list_reduce`). Pure projection: zero shuffle, zero
  *     broadcast — at 100 TB this is a scan.
  *   - duplicated-span fraction: the exact-substring dedup signal (per
  *     Lee et al. 2022's "train-dedup" at span granularity): strided
  *     16-token spans are hashed, each span hash's OWNER is its smallest
  *     doc_id, and a doc's score is the fraction of its distinct spans
  *     owned by an earlier doc. The shuffle moves (doc_id, hash) pairs
  *     only — never text — which is the O(corpus tokens / stride × 16 B)
  *     shape that survives 100 TB.
  */
object Scoring {

  /** BM25 parameters (standard Robertson defaults). */
  val k1 = 1.2
  val b = 0.75

  /** The fixed retrieval query: three terms present in the harness vocab. */
  val bm25Terms: Seq[String] = Seq("merge", "window", "stream")

  /** Classifier dials: hash-bucket count and the per-bucket deterministic
    * weight in [-1, 1] derived from md5 of the bucket id — replayable by
    * the oracle, stable across runs/partitionings. */
  val numBuckets = 4096

  // r18: the per-token weight fold runs as ONE memoized kernel pass
  // (TextHashes.hashedWeightSum — same md5 formula, same ordered IEEE
  // additions; the old aggregate(transform(t, weight)) evaluated two md5s
  // per token OCCURRENCE where the vocabulary is bounded)
  private def wSum(toks: Column): Column =
    GraftFunctions.weightSum(toks, numBuckets)

  /** DuckDB twin of the kernel's per-token weight. */
  private def weightSql(x: String): String =
    s"(('0x' || substr(md5('w_' || ((('0x' || substr(md5($x), 1, 15))::BIGINT) " +
      s"% $numBuckets)::VARCHAR), 1, 15))::BIGINT % 2001 - 1000) / 1000.0"

  /** DuckDB token split (same contract as [[GraftFunctions.tokens]]). */
  private val tokSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  val spanLen = 16
  val spanStride = 8

  /** ALIGNED exact-substring EXCISION — the grid approximation: every
    * repeated non-overlapping `spanL`-token span (stride = length, so
    * spans start only at multiples of spanL) keeps exactly its FIRST
    * occurrence in corpus order (min doc_id·10⁹ + span_idx per span hash)
    * and is cut everywhere else; each document's text is rebuilt from the
    * surviving tokens. Returns (id, n_before, n_removed_spans, n_after,
    * cleaned).
    *
    * CONTRACT NOTE (r14 verdict #2): span hashes are computed on the
    * ALIGNED 16-token grid, a strictly weaker contract than Lee et al.
    * 2022's suffix-array ExactSubstr — a duplicate passage offset by
    * 1–15 tokens from a span boundary is invisible here. The
    * shift-invariant operator is [[exciseSpansShift]] /
    * `q_dedup_substring_shift`; this one survives as the cheap
    * grid-granular twin (16× fewer span hashes through the shuffle).
    *
    * Scale shape: the window shuffles (id, idx, hash) triples only —
    * never text; removal lists (∝ duplication density, not corpus size)
    * join back onto the full-text scan where AQE broadcasts them
    * (plan-locked in PlanSpec), and the rebuild is a zero-shuffle
    * indexed-HOF projection. Corpus text is scanned exactly twice and
    * shuffled never. Callers must have GraftFunctions registered. */
  def exciseSpans(docs: DataFrame, idCol: String, textCol: String,
      spanL: Int = spanLen): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    val spans = toks
      .where(size(col("t")) >= spanL)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), expr(s"size(t) div $spanL - 1")),
        i => md5Hash60(concat_ws(" ",
          slice(col("t"), i * spanL + 1, lit(spanL)))))))
      .withColumnRenamed("pos", "idx").withColumnRenamed("col", "h")
      .withColumn("key", col("doc_id") * lit(1000000000L) + col("idx"))
    val removed = spans
      .withColumn("first", min(col("key")).over(Window.partitionBy("h")))
      .where(col("key") > col("first"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("idx"))).as("rm"))
    toks.join(removed, Seq("doc_id"), "left")
      .withColumn("rmc", coalesce(col("rm"), array().cast("array<int>")))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_before"),
        size(col("rmc")).cast("long").as("n_removed_spans"),
        (size(col("t")) - lit(spanL) * size(col("rmc")))
          .cast("long").as("n_after"),
        array_join(filter(col("t"),
          (x, p) => !array_contains(col("rmc"),
            (p.cast("double") / spanL).cast("int"))), " ").as("cleaned"))
  }

  /** SHIFT-INVARIANT exact-substring EXCISION (r15 — suffix-array
    * semantics at fixed match length `spanL`, the Lee et al. 2022
    * operation an actual dedup run needs): span hashes are computed at
    * EVERY position (stride 1, the [[graft.functions.TextHashes
    * .gramHashes60]] codegen kernel), so a duplicated passage is caught
    * at ANY alignment — the 1-to-15-token-offset duplicates the aligned
    * grid misses. Ownership is min global position (doc_id·10⁹ + pos)
    * per span hash; every non-canonical occurrence marks its spanL token
    * positions for removal, and overlapping marks resolve into maximal
    * non-overlapping cut intervals per document (reported as
    * `n_intervals`) simply by removing the UNION of marked positions.
    * Documents are rebuilt from the surviving tokens. Returns (doc_id,
    * n_before, n_removed_toks, n_intervals, n_after, cleaned).
    *
    * Scale shape: stride-1 hashing is a per-row codegen projection (the
    * rolling-gram kernel — no per-position expression interpretation);
    * the ownership window shuffles (doc_id, pos, hash) triples only,
    * ~n_tokens rows of ~24 B — 16× the aligned twin's rows but still
    * O(corpus tokens), never text; marked positions ∝ duplication
    * density × spanL, grouped once per doc; the removal lists join back
    * onto the full-text scan where AQE broadcasts them, and the rebuild
    * is a zero-shuffle indexed-lambda filter. Corpus text is scanned
    * exactly twice and shuffled never — the same shape the aligned twin
    * ships, paying only the 16× narrow-row factor for full shift
    * invariance. Callers must have GraftFunctions registered. */
  def exciseSpansShift(docs: DataFrame, idCol: String, textCol: String,
      spanL: Int = spanLen): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    val spans = toks
      .select(col("doc_id"), posexplode(gramHashes60(col("t"), spanL)))
      .select(col("doc_id"), col("pos").as("idx"), col("col").as("h"),
        (col("doc_id") * lit(1000000000L) + col("pos")).as("key"))
    val marked = spans
      .withColumn("first", min(col("key")).over(Window.partitionBy("h")))
      .where(col("key") > col("first"))
      .select(col("doc_id"),
        explode(sequence(col("idx"), col("idx") + (spanL - 1))).as("p"))
    val removed = marked.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("p"))).as("rm"))
    toks.join(removed, Seq("doc_id"), "left")
      .withColumn("rmc", coalesce(col("rm"), array().cast("array<int>")))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_before"),
        size(col("rmc")).cast("long").as("n_removed_toks"),
        size(filter(col("rmc"), p => !array_contains(col("rmc"), p - 1)))
          .cast("long").as("n_intervals"),
        (size(col("t")) - size(col("rmc"))).cast("long").as("n_after"),
        array_join(filter(col("t"),
          (_, p) => !array_contains(col("rmc"), p)), " ").as("cleaned"))
  }

  /** DuckDB CTE chain ending in `b` = (bin, n, pos, cs): the 16-bin
    * calibration rollup of the hashed quality classifier against the
    * long-doc proxy label — shared by q_calibration_ece and
    * q_calibration_isotonic. */
  private def calibBinsSql: String =
    s"""toks AS (SELECT doc_id, $tokSql AS t FROM documents),
       |f AS (SELECT len(t)::BIGINT AS n_toks,
       |    list_reduce(list_prepend(0.0, list_transform(t, x -> ${weightSql("x")})),
       |      (a, c) -> a + c) AS w_sum
       |  FROM toks WHERE len(t) > 0),
       |sc AS (SELECT round(1.0 / (1.0 + exp(-(w_sum / n_toks))), 6) AS prob,
       |    n_toks >= 64 AS label FROM f),
       |b AS (SELECT least(15, floor(prob * 16)::INTEGER)::BIGINT AS bin,
       |    count(*)::BIGINT AS n,
       |    count(CASE WHEN label THEN 1 END)::BIGINT AS pos,
       |    sum(prob::DECIMAL(18,6)) AS cs
       |  FROM sc GROUP BY 1)""".stripMargin

  /** Spark twin of [[calibBinsSql]]: (bin, n, pos, cs) — ONE bin-keyed
    * partial agg over the classifier-scored corpus. */
  private def calibBins(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .where(size(col("t")) > 0)
      .select(size(col("t")).cast("long").as("n_toks"),
        wSum(col("t")).as("w_sum"))
      .select(
        round(lit(1.0) / (lit(1.0) + exp(-(col("w_sum") / col("n_toks")))), 6)
          .as("prob"),
        (col("n_toks") >= 64).as("label"))
      .select(least(lit(15), floor(col("prob") * 16).cast("int")).cast("long").as("bin"),
        col("prob"), col("label"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        count(when(col("label"), 1)).as("pos"),
        sum(col("prob").cast(DecimalType(18, 6))).as("cs"))
  }

  private val statsCache = new graft.core.SessionCache[org.apache.spark.sql.DataFrame]

  /** DuckDB CTE chain producing `scored` = (doc_id, dl, score) — the
    * oracle twin of [[bm25Scored]] (score rounded to 4; the `score > 0`
    * filter is applied by consumers). Shared by the `q_bm25` and
    * `q_hybrid_rrf` oracles. */
  private def bm25CtesSql: String =
    s"""toks AS (SELECT doc_id, $tokSql AS t FROM documents),
       |base AS (SELECT doc_id, len(t) AS dl,
       |    len(list_filter(t, x -> x = 'merge')) AS tf0,
       |    len(list_filter(t, x -> x = 'window')) AS tf1,
       |    len(list_filter(t, x -> x = 'stream')) AS tf2
       |  FROM toks),
       |stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
       |    count(*) FILTER (WHERE tf0 > 0)::BIGINT AS df0,
       |    count(*) FILTER (WHERE tf1 > 0)::BIGINT AS df1,
       |    count(*) FILTER (WHERE tf2 > 0)::BIGINT AS df2
       |  FROM base),
       |scored AS (SELECT doc_id, dl::BIGINT AS dl, round(
       |    (ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0)
       |      * ((tf0 * ${k1 + 1}) / (tf0 + $k1 * ((1.0 - $b) + ($b * dl) / (sum_dl::DOUBLE / n_docs)))))
       |  + (ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0)
       |      * ((tf1 * ${k1 + 1}) / (tf1 + $k1 * ((1.0 - $b) + ($b * dl) / (sum_dl::DOUBLE / n_docs)))))
       |  + (ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0)
       |      * ((tf2 * ${k1 + 1}) / (tf2 + $k1 * ((1.0 - $b) + ($b * dl) / (sum_dl::DOUBLE / n_docs))))),
       |  4) AS score
       |  FROM base CROSS JOIN stats)""".stripMargin

  /** BM25-scored corpus for the fixed query: (doc_id, dl, score), score
    * rounded to 4 decimals and filtered > 0 (pre-ranking). Shared by
    * `q_bm25` and the hybrid-fusion sparse leg. Corpus stats (N, Σdl,
    * per-term df) are a property of (corpus, query terms), not of this
    * invocation — computed once per session and checkpointed, so repeat
    * retrievals pay ONE corpus scan, not two (same pattern as Graph.edges
    * / Curation.gramSets). */
  private def bm25Scored(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val t = tokens(col("text"))
    val tf = bm25Terms.zipWithIndex.map { case (term, i) =>
      size(filter(col("t"), x => x === term)).as(s"tf$i")
    }
    val base = Tables.documents(s, d)
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id") +: size(col("t")).as("dl") +: tf: _*)
    val stats = statsCache.getOrElseUpdate(s,
        s"bm25:$d:${bm25Terms.mkString(",")}") {
      val statCols = count(lit(1)).as("n_docs") +:
        sum(col("dl")).as("sum_dl") +:
        bm25Terms.indices.map(i =>
          count(when(col(s"tf$i") > 0, 1)).as(s"df$i"))
      base.agg(statCols.head, statCols.tail: _*).localCheckpoint()
    }
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val termScore = bm25Terms.indices.map { i =>
      log((col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))
          + lit(1.0)) *
        ((col(s"tf$i") * lit(k1 + 1)) /
          (col(s"tf$i") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / avgdl)))
    }
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl").cast("long").as("dl"),
        round(termScore.reduceLeft(_ + _), 4).as("score"))
      .where(col("score") > 0)
  }

  /** Distributed full-batch perceptron TRAINING (r15) — the from-scratch
    * linear-classifier loop next to the inference-side
    * `q_quality_classifier`: k rounds of
    *
    *   margin_i = y_i · (w·x_i);   w ← w + Σ_{margin_i ≤ 0} y_i·x_i
    *
    * over integer features, so every round is ONE partial-aggregated scan
    * (reduce side = d+1 longs per partition) with the weight vector
    * broadcast as literals — the textbook data-parallel training shape:
    * cost per round ∝ corpus / cluster, driver state ∝ d. All arithmetic
    * is int64 — exact, order-free, partitioning-invariant WITHIN the
    * headroom a per-round guard enforces (ADVICE r15: weights grow with
    * corpus-sized gradient sums, so the loop fails fast the moment a
    * margin product, gradient sum, or weight update could leave int64,
    * instead of silently wrapping) — so the DuckDB oracle replays the
    * WHOLE loop bit-for-bit in one recursive CTE over the corpus collapsed
    * to a feature list (the q_bpe_train discipline).
    *
    * Label: the established long-doc proxy (n_toks ≥ 64 — the
    * q_calibration_ece label; the OPERATOR is the point, the label a
    * harness stand-in). Features are CENTERED integers ([16, n_toks−64,
    * stops−4, distinct−44]) — batch-summed updates overshoot into a
    * 2-cycle when one raw feature's scale dominates the bias (measured:
    * raw n_chars never converges; centered features reach zero training
    * error in 13 rounds at 500 docs). After convergence the gradient is
    * empty and every later round is a fixed-point row (w unchanged,
    * n_err = 0), so a FIXED k stays oracle-replayable with no early-stop
    * protocol. Output: the full (round, n_err, w) trajectory — n_err is
    * measured under the PREVIOUS round's w, i.e. the count that round's
    * update corrects. */
  def perceptronTrain(docs: DataFrame, k: Int = 24): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stop = Seq("the", "and", "of", "a", "is")
    val feats = docs
      .select(tokens(col("text")).as("t"))
      .select(
        when(size(col("t")) >= 64, 1L).otherwise(-1L).as("y"),
        lit(16L).as("x1"),
        (size(col("t")).cast("long") - 64L).as("x2"),
        (size(filter(col("t"), c => stop.map(m => c === m).reduce(_ || _)))
          .cast("long") - 4L).as("x3"),
        (size(array_distinct(col("t"))).cast("long") - 44L).as("x4"))
      .persist()
    try {
      // ADVICE r15: the int64-exactness claim needs a checked BOUND, not
      // faith — w grows by corpus-sized gradient sums each round, so at
      // extreme corpus sizes a margin product w·x could overflow silently
      // BEFORE the documented convergence fixed point. One agg captures n
      // and per-feature max|x|; every round then fails fast (BigInt check,
      // exact) if the NEXT round's margin Σ|w_i|·max|x_i|, a gradient sum
      // n·max|x_i|, or an update |w_i|+n·max|x_i| could leave int64. In the
      // convergent regime the guard never fires (weights stop moving); it
      // converts the silent-wrong-answer failure mode into a loud one.
      val b = feats.agg(count(lit(1)),
        max(abs(col("x1"))), max(abs(col("x2"))),
        max(abs(col("x3"))), max(abs(col("x4")))).collect()(0)
      val n = b.getLong(0)
      val maxAbs = Array(b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4))
      def guard(w: Array[Long], round: Int): Unit = {
        val lmax = BigInt(Long.MaxValue)
        val margin = w.zip(maxAbs).map { case (wi, mi) => BigInt(wi).abs * mi }.sum
        val worst = w.zip(maxAbs).map { case (wi, mi) =>
          (BigInt(wi).abs + BigInt(n) * mi).max(BigInt(n) * mi) }.max
        require(margin <= lmax && worst <= lmax,
          s"perceptronTrain: int64 headroom exhausted at round $round " +
            s"(corpus n=$n, max|x|=${maxAbs.mkString(",")}, w=${w.mkString(",")}) — " +
            "rescale/center features or reduce rounds")
      }
      var w = Array(0L, 0L, 0L, 0L)
      guard(w, 0)
      val hist = Seq.newBuilder[(Long, Long, Long, Long, Long, Long)]
      for (r <- 1 to k) {
        val margin = col("y") * (lit(w(0)) * col("x1") + lit(w(1)) * col("x2") +
          lit(w(2)) * col("x3") + lit(w(3)) * col("x4"))
        val mis = margin <= 0
        def g(x: String) = sum(when(mis, col("y") * col(x)).otherwise(0L))
        val row = feats
          .agg(sum(when(mis, 1L).otherwise(0L)).as("n_err"),
            g("x1"), g("x2"), g("x3"), g("x4"))
          .collect()(0)
        w = Array(w(0) + row.getLong(1), w(1) + row.getLong(2),
          w(2) + row.getLong(3), w(3) + row.getLong(4))
        guard(w, r)
        hist += ((r.toLong, row.getLong(0), w(0), w(1), w(2), w(3)))
      }
      hist.result()
        .toDF("round", "n_err", "w_bias", "w_toks", "w_stop", "w_distinct")
    } finally { feats.unpersist(); () }
  }

  val all: Map[String, Q] = Map(

    // -- BM25 retrieval: score every doc for the fixed 3-term query and
    //    return the top 20. Float parity: the scoring expression is
    //    written with the IDENTICAL operation order in both engines
    //    (left-assoc, explicit parens), the only transcendental (ln) is
    //    followed by a product chain, and the final score is rounded to 4
    //    decimals before ranking so a last-ulp libm-vs-JVM difference
    //    cannot flip the order (tie-break: doc_id). --
    "q_bm25" -> Q(
      (s, d) => bm25Scored(s, d)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20),
      s"""WITH $bm25CtesSql
         |SELECT doc_id, dl, score FROM scored WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),

    // -- hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009) of
    //    the BM25 sparse leg and a dense cosine leg against the query
    //    vector (vec_id 0's embedding — the stand-in for an encoded query).
    //    Each leg is ranked INDEPENDENTLY on its rounded score (desc,
    //    id tie-break — integer ranks, so fusion is float-robust), cut to
    //    its top 50 via TakeOrdered (never a global sort), and fused:
    //    rrf = 1/(60+r_sparse) + 1/(60+r_dense), absent legs contribute 0.
    //    Scale: the sparse leg is the BM25 scan (stats broadcast), the
    //    dense leg is one broadcast-query cosine scan; both reduce to ≤ 50
    //    rows BEFORE the rank windows, so the single-partition windows and
    //    the full-outer fusion join are bounded by the cut K, never the
    //    corpus. --
    "q_hybrid_rrf" -> Q(
      (s, d) => {
        val kCut = 50
        val sTop = bm25Scored(s, d)
          .orderBy(col("score").desc, col("doc_id")).limit(kCut)
        val sparse = sTop
          .withColumn("sr",
            row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
          .select(col("doc_id"), col("sr"))
        val e = Tables.embeddings(s, d)
        val qv = e.where(col("vec_id") === 0).select(col("embedding").as("qv"))
        val dTop = e.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .select(col("vec_id"),
            round(cosineSim(col("qv"), col("embedding")), 6).as("cos"))
          .orderBy(col("cos").desc, col("vec_id")).limit(kCut)
        val dense = dTop
          .withColumn("dr",
            row_number().over(Window.orderBy(col("cos").desc, col("vec_id"))))
          .select(col("vec_id"), col("dr"))
        sparse.join(dense, col("doc_id") === col("vec_id"), "full_outer")
          .select(
            coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
            col("sr").cast("int").as("sparse_rank"),
            col("dr").cast("int").as("dense_rank"),
            round(coalesce(lit(1.0) / (lit(60) + col("sr")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("dr")), lit(0.0)), 9).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(20)
      },
      s"""WITH $bm25CtesSql,
         |sparse AS (
         |  SELECT doc_id, rn AS sr FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
         |    FROM scored WHERE score > 0)
         |  WHERE rn <= 50),
         |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |dcos AS (SELECT e.vec_id,
         |    round(${PipelineQueries.cosSql("qv.qv", "e.embedding")}, 6) AS cos
         |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
         |dense AS (
         |  SELECT vec_id, rn AS dr FROM (
         |    SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS rn
         |    FROM dcos)
         |  WHERE rn <= 50),
         |fused AS (
         |  SELECT coalesce(s.doc_id, d.vec_id) AS doc_id,
         |    s.sr::INT AS sparse_rank, d.dr::INT AS dense_rank,
         |    round(coalesce((1.0::DOUBLE) / (60 + s.sr), 0.0::DOUBLE)
         |        + coalesce((1.0::DOUBLE) / (60 + d.dr), 0.0::DOUBLE), 9) AS rrf
         |  FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.vec_id)
         |SELECT doc_id, sparse_rank, dense_rank, rrf FROM fused
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin),

    // -- hashed linear classifier: w_sum is an ordered fold over the
    //    token array (aggregate ≡ list_reduce: same element order, same
    //    IEEE additions, bit-identical result); only the logistic output
    //    is rounded (exp differs in the last ulp across libms). --
    "q_quality_classifier" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .where(size(col("t")) > 0)
          .select(col("doc_id"), size(col("t")).cast("long").as("n_toks"),
            wSum(col("t")).as("w_sum"))
          .withColumn("score", col("w_sum") / col("n_toks"))
          .select(col("doc_id"), col("n_toks"), col("w_sum"), col("score"),
            round(lit(1.0) / (lit(1.0) + exp(-col("score"))), 6).as("prob"),
            (col("score") > 0.0).as("keep"))
          .orderBy("doc_id")
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |f AS (SELECT doc_id, len(t)::BIGINT AS n_toks,
         |    list_reduce(list_prepend(0.0, list_transform(t, x -> ${weightSql("x")})),
         |      (a, c) -> a + c) AS w_sum
         |  FROM toks WHERE len(t) > 0)
         |SELECT doc_id, n_toks, w_sum, w_sum / n_toks AS score,
         |  round(1.0 / (1.0 + exp(-(w_sum / n_toks))), 6) AS prob,
         |  (w_sum / n_toks > 0.0) AS keep
         |FROM f ORDER BY doc_id""".stripMargin),

    // -- distributed batch-perceptron training (r15): k=24 rounds, each
    //    ONE partial-agg scan with broadcast weights; all-int64 exact, so
    //    the oracle replays the whole loop in one recursive CTE over the
    //    corpus collapsed to a feature list (q_bpe_train discipline).
    //    Converges to zero training error (round 13 at sf0.01);
    //    post-convergence rounds are fixed-point rows by construction. --
    "q_perceptron_train" -> Q(
      (s, d) => perceptronTrain(Tables.documents(s, d)),
      s"""WITH RECURSIVE f AS (
         |  SELECT CASE WHEN len(t) >= 64 THEN 1 ELSE -1 END::BIGINT AS y,
         |    [16::BIGINT, len(t)::BIGINT - 64,
         |     len(list_filter(t, x -> x IN ('the','and','of','a','is')))::BIGINT - 4,
         |     len(list_distinct(t))::BIGINT - 44] AS x
         |  FROM (SELECT $tokSql AS t FROM documents)),
         |c AS (SELECT list({'y': y, 'x': x}) AS fs FROM f),
         |rec AS (
         |  SELECT 0 AS round, [0,0,0,0]::BIGINT[] AS w, 0::BIGINT AS n_err FROM c
         |  UNION ALL
         |  SELECT r.round + 1,
         |    list_transform(range(1, 5), j -> r.w[j] + list_sum(list_transform(c.fs, f ->
         |      CASE WHEN f.y * (r.w[1]*f.x[1] + r.w[2]*f.x[2] + r.w[3]*f.x[3] + r.w[4]*f.x[4]) <= 0
         |           THEN f.y * f.x[j] ELSE 0 END))::BIGINT),
         |    list_sum(list_transform(c.fs, f ->
         |      CASE WHEN f.y * (r.w[1]*f.x[1] + r.w[2]*f.x[2] + r.w[3]*f.x[3] + r.w[4]*f.x[4]) <= 0
         |           THEN 1 ELSE 0 END))::BIGINT
         |  FROM rec r, c WHERE r.round < 24)
         |SELECT round::BIGINT AS round, n_err, w[1] AS w_bias, w[2] AS w_toks,
         |  w[3] AS w_stop, w[4] AS w_distinct
         |FROM rec WHERE round >= 1 ORDER BY round""".stripMargin),

    // -- classifier calibration (r14): the reliability diagram + expected
    //    calibration error of the hashed quality classifier — the eval a
    //    pipeline runs before trusting classifier-filtered data. The
    //    label is a deterministic long-doc proxy (n_toks ≥ 64; the
    //    OPERATOR — binning, per-bin accuracy vs confidence, ECE terms —
    //    is the point, the label a harness stand-in). Exactness: prob is
    //    rounded to 6 dp, so DECIMAL(18,6) sums it EXACTLY and
    //    order-free; counts are ints; per-bin ECE terms are emitted as
    //    rows (the q_psi_drift discipline) with one mirrored float
    //    expression each. ONE bin-keyed partial agg, reduce ∝ 16 bins. --
    "q_calibration_ece" -> Q(
      (s, d) => {
        val bins = calibBins(s, d)
        val tot = bins.agg(sum(col("n")).as("nn"))
        val acc = col("pos").cast("double") / col("n")
        val conf = col("cs").cast("double") / col("n")
        bins.crossJoin(broadcast(tot))
          .select(col("bin"), col("n"), col("pos"),
            round(acc, 9).as("acc"), round(conf, 9).as("conf"),
            round((col("n").cast("double") / col("nn")) * abs(acc - conf), 9)
              .as("ece_term"))
          .orderBy("bin")
      },
      s"""WITH $calibBinsSql,
         |t AS (SELECT sum(n)::BIGINT AS nn FROM b)
         |SELECT bin, n, pos,
         |  round(pos::DOUBLE / n, 9) AS acc,
         |  round(cs::DOUBLE / n, 9) AS conf,
         |  round((n::DOUBLE / nn) * abs(pos::DOUBLE / n - cs::DOUBLE / n), 9)
         |    AS ece_term
         |FROM b CROSS JOIN t ORDER BY bin""".stripMargin),

    // -- isotonic calibration (r14): ECE's fix — fit the NONDECREASING
    //    step function closest to the per-bin empirical rates by
    //    pool-adjacent-violators. Every merge decision is the exact
    //    integer cross-multiply numᵢ·denⱼ < numⱼ·denᵢ (never a float
    //    compare), so the block structure — and therefore the fitted
    //    rates, emitted as exact num/den pairs — is engine-independent,
    //    and the DuckDB oracle replays the WHOLE merge loop in one
    //    recursive CTE over a list-of-blocks state. Distributed cost:
    //    the one bin-keyed agg; PAVA runs on ≤ 16 driver rows. --
    "q_calibration_isotonic" -> Q(
      (s, d) => {
        import s.implicits._
        val bins = calibBins(s, d)
          .select(col("bin"), col("n"), col("pos"))
          .orderBy("bin").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // PAVA: (num, den, nBins) blocks; merge while the top violates
        // monotonicity against its predecessor
        val stack = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        bins.foreach { case (_, n, pos) =>
          stack += ((pos, n, 1L))
          while (stack.length >= 2 && {
            val t = stack(stack.length - 1); val p = stack(stack.length - 2)
            t._1 * p._2 < p._1 * t._2
          }) {
            val t = stack.remove(stack.length - 1)
            val p = stack.remove(stack.length - 1)
            stack += ((p._1 + t._1, p._2 + t._2, p._3 + t._3))
          }
        }
        val perBin = stack.flatMap { case (num, den, nb) =>
          Seq.fill(nb.toInt)((num, den)) }
        bins.zip(perBin).map { case ((bin, n, pos), (num, den)) =>
          (bin, n, pos, num, den) }.toSeq
          .toDF("bin", "n", "pos", "cal_num", "cal_den")
          .select(col("bin"), col("n"), col("pos"), col("cal_num"),
            col("cal_den"),
            round(col("cal_num").cast("double") / col("cal_den"), 9)
              .as("cal_rate"))
          .orderBy("bin")
      },
      s"""WITH RECURSIVE $calibBinsSql,
         |rb AS (SELECT bin, n, pos, row_number() OVER (ORDER BY bin) AS rn
         |  FROM b),
         |nb AS (SELECT count(*)::BIGINT AS m FROM rb),
         |it(step, i, blocks) AS (
         |  SELECT 0::BIGINT, 0::BIGINT,
         |    []::STRUCT(num BIGINT, den BIGINT, nb BIGINT)[]
         |  UNION ALL
         |  SELECT it.step + 1,
         |    CASE WHEN len(it.blocks) >= 2
         |           AND it.blocks[-1].num * it.blocks[-2].den
         |             < it.blocks[-2].num * it.blocks[-1].den
         |         THEN it.i ELSE it.i + 1 END,
         |    CASE WHEN len(it.blocks) >= 2
         |           AND it.blocks[-1].num * it.blocks[-2].den
         |             < it.blocks[-2].num * it.blocks[-1].den
         |         THEN list_append(it.blocks[1:len(it.blocks) - 2],
         |           {'num': it.blocks[-2].num + it.blocks[-1].num,
         |            'den': it.blocks[-2].den + it.blocks[-1].den,
         |            'nb': it.blocks[-2].nb + it.blocks[-1].nb})
         |         ELSE list_append(it.blocks,
         |           {'num': rb.pos, 'den': rb.n, 'nb': 1::BIGINT}) END
         |  FROM it CROSS JOIN nb LEFT JOIN rb ON rb.rn = it.i + 1
         |  WHERE (len(it.blocks) >= 2
         |         AND it.blocks[-1].num * it.blocks[-2].den
         |           < it.blocks[-2].num * it.blocks[-1].den)
         |        OR it.i < nb.m),
         |fin AS (SELECT blocks FROM it ORDER BY step DESC LIMIT 1),
         |ex AS (SELECT unnest(blocks) AS blk,
         |    unnest(range(1, len(blocks) + 1)) AS j FROM fin),
         |cum AS (SELECT j, blk,
         |    sum(blk.nb) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) AS cend
         |  FROM ex)
         |SELECT rb.bin, rb.n, rb.pos,
         |  cum.blk.num AS cal_num, cum.blk.den AS cal_den,
         |  round(cum.blk.num::DOUBLE / cum.blk.den, 9) AS cal_rate
         |FROM cum JOIN rb
         |  ON rb.rn BETWEEN cum.cend - cum.blk.nb + 1 AND cum.cend
         |ORDER BY rb.bin""".stripMargin),

    // -- top-k per group (the grouped-retrieval shape: "best 3 docs per
    //    language"): rank-within-partition + filter — the window sorts
    //    only inside each group's partition, so the operator never global-
    //    sorts the corpus; ties broken by doc_id for determinism. --
    "q_group_topk" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), col("n_chars"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select(col("lang"), col("rk").cast("long").as("rk"),
            col("doc_id"), col("n_chars"))
          .orderBy("lang", "rk")
      },
      """SELECT lang, rk, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin),

    // -- token-distribution Shannon entropy (the Gopher-family "gibberish
    //    or boilerplate" signal): H = -Σ (c/n)·ln(c/n) over the per-type
    //    counts. Counts come from RUN LENGTHS of the sorted token array
    //    (run ends = positions where the next element differs, padded
    //    with an empty-string sentinel no [a-z0-9]+ token can equal) —
    //    O(n log n) per row, not the O(n·d) nested count-per-distinct
    //    scan (r12 review). Counts are then SORTED before the fold, so
    //    both engines fold an identical array in identical order —
    //    entropy depends only on the count multiset, and sorting removes
    //    the cross-engine element-order hazard. Per-element ln() can
    //    still drift a last ulp, so the result is rounded to 6 decimals.
    //    Pure per-row projection: zero shuffle. --
    "q_entropy" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        // ascending run counts from the sortedRunCounts KERNEL, not the
        // array_sort/element_at expression chain: the pure-HOF version
        // inlined every intermediate (st, nxt, ends) into one interpreted
        // tree, so each element access re-evaluated the inner sort — a
        // combinatorial blow-up (30+ CPU-min on one sf0.1 task, r13).
        // The remaining fold runs over a materialized small long array.
        Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .where(size(col("t")) > 0)
          .select(col("doc_id"), size(col("t")).cast("long").as("n_toks"),
            GraftFunctions.sortedRunCounts(col("t")).as("cnts"))
          .select(col("doc_id"), col("n_toks"),
            size(col("cnts")).cast("long").as("n_distinct"),
            // abs: a uniform-singleton doc folds to -0.0, which can hash
            // differently from 0.0 in the driver compare
            abs(round(-aggregate(col("cnts"), lit(0.0),
              (acc, c) => acc + (c.cast("double") / col("n_toks"))
                * log(c.cast("double") / col("n_toks"))), 6)).as("entropy"))
          .withColumn("low_entropy", col("entropy") < 2.0)
          .orderBy("doc_id")
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |srt AS (SELECT doc_id, len(t) AS n, list_sort(t) AS st
         |  FROM toks WHERE len(t) > 0),
         |sh AS (SELECT doc_id, n, st, list_concat(st[2:n], ['']) AS nxt
         |  FROM srt),
         |runs AS (SELECT doc_id, n,
         |    list_filter(range(1, n + 1), i -> st[i] <> nxt[i]) AS ends
         |  FROM sh),
         |c AS (SELECT doc_id, n::BIGINT AS n_toks,
         |    len(ends)::BIGINT AS n_distinct,
         |    list_sort(list_transform(range(1, len(ends) + 1),
         |      j -> CASE WHEN j = 1 THEN ends[1]
         |                ELSE ends[j] - ends[j - 1] END)) AS cnts
         |  FROM runs)
         |SELECT doc_id, n_toks, n_distinct,
         |  abs(round(-list_reduce(list_prepend(0.0, list_transform(cnts,
         |      c -> (c::DOUBLE / n_toks) * ln(c::DOUBLE / n_toks))),
         |    (a, b) -> a + b), 6)) AS entropy,
         |  (abs(round(-list_reduce(list_prepend(0.0, list_transform(cnts,
         |      c -> (c::DOUBLE / n_toks) * ln(c::DOUBLE / n_toks))),
         |    (a, b) -> a + b), 6)) < 2.0) AS low_entropy
         |FROM c ORDER BY doc_id""".stripMargin),

    // -- duplicated-span fraction: distinct strided 16-token span hashes
    //    per doc; a span is "duplicated" when a smaller doc_id also
    //    contains it. The owner (min doc_id per span hash) comes from a
    //    window over the hash — ONE pass over the corpus, no self-join
    //    (the groupBy+join-back formulation scans the tokenize+shingle
    //    explode twice); only (doc_id, hash) pairs shuffle. --
    "q_dup_span_frac" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val spans = Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .where(size(col("t")) >= spanLen)
          .select(col("doc_id"), explode(array_distinct(
            transform(
              sequence(lit(0), expr(s"(size(t) - $spanLen) div $spanStride")),
              i => md5Hash60(concat_ws(" ",
                slice(col("t"), i * spanStride + 1, lit(spanLen))))))).as("h"))
        spans
          .withColumn("owner", min(col("doc_id"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy("h")))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("owner") < col("doc_id"), 1L).otherwise(0L)).as("n_dup"))
          .select(col("doc_id"), col("n_spans"), col("n_dup"),
            (col("n_dup").cast("double") / col("n_spans")).as("dup_span_frac"))
          .orderBy("doc_id")
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= $spanLen),
         |s AS (SELECT DISTINCT doc_id,
         |    ('0x' || substr(md5(sp), 1, 15))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(list_transform(
         |          range(0, (n - $spanLen) // $spanStride + 1),
         |          i -> array_to_string(t[i * $spanStride + 1 : i * $spanStride + $spanLen], ' '))) AS sp
         |        FROM d)),
         |o AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS owner FROM s)
         |SELECT doc_id, count(*)::BIGINT AS n_spans,
         |  sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END)::BIGINT AS n_dup,
         |  sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END)::DOUBLE / count(*)
         |    AS dup_span_frac
         |FROM o GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // -- ALIGNED exact-substring EXCISION (r14): q_dup_span_frac scores
    //    the duplication; this query cuts it on the 16-token GRID — every
    //    repeated aligned span keeps exactly its FIRST occurrence in
    //    corpus order and is cut everywhere else, then each document's
    //    text is rebuilt from the surviving tokens. Grid alignment
    //    (stride = length) is an APPROXIMATION of Lee et al. 2022: a
    //    duplicate offset 1-15 tokens from the grid escapes — use
    //    q_dedup_substring_shift for the shift-invariant semantics; this
    //    twin costs 16x fewer span hashes through the shuffle. The
    //    canonical occurrence is min(doc_id·10⁹ + span_idx) per span hash
    //    (span_idx < 10⁹ would need a single 16-billion-token document).
    //    Scale shape: the window shuffles (doc_id, idx, hash) triples
    //    only — never text; the removal lists (∝ duplication density, not
    //    corpus size) join back onto the full-text scan, where AQE
    //    broadcasts them, and the rebuild is a zero-shuffle indexed-HOF
    //    projection. At 100 TB the corpus text is scanned exactly twice
    //    and shuffled never. --
    "q_dedup_substring" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        exciseSpans(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id")
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |d AS (SELECT doc_id, t, len(t) AS n FROM toks),
         |s AS (SELECT doc_id, i AS idx,
         |    ('0x' || substr(md5(array_to_string(
         |      t[i * $spanLen + 1 : i * $spanLen + $spanLen], ' ')), 1, 15))::BIGINT AS h,
         |    doc_id * 1000000000 + i AS key
         |  FROM (SELECT doc_id, t, unnest(range(0, n // $spanLen)) AS i
         |        FROM d WHERE n >= $spanLen)),
         |o AS (SELECT doc_id, idx, key,
         |    min(key) OVER (PARTITION BY h) AS first FROM s),
         |rem AS (SELECT doc_id, list_sort(list(idx)) AS rm
         |  FROM o WHERE key > first GROUP BY doc_id)
         |SELECT d.doc_id, d.n::BIGINT AS n_before,
         |  coalesce(len(rm), 0)::BIGINT AS n_removed_spans,
         |  (d.n - $spanLen * coalesce(len(rm), 0))::BIGINT AS n_after,
         |  coalesce(array_to_string(list_transform(
         |    list_filter(range(1, d.n + 1),
         |      p -> NOT list_contains(coalesce(rm, []::BIGINT[]), (p - 1) // $spanLen)),
         |    p -> d.t[p]), ' '), '') AS cleaned
         |FROM d LEFT JOIN rem ON d.doc_id = rem.doc_id
         |ORDER BY d.doc_id""".stripMargin),

    // -- SHIFT-INVARIANT exact-substring excision (r15, verdict #2): the
    //    suffix-array semantics q_dedup_substring's aligned grid
    //    approximates — stride-1 span hashes catch a duplicated passage
    //    at ANY offset (ownership = min global position per hash),
    //    overlapping removals resolve to maximal non-overlapping cut
    //    intervals by unioning marked positions. The oracle replays the
    //    identical computation 1-based (DuckDB's list lambdas are
    //    1-indexed; the +1-uniform keys preserve every min-ownership
    //    winner). See exciseSpansShift for the scale shape. --
    "q_dedup_substring_shift" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        exciseSpansShift(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc_id")
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |d AS (SELECT doc_id, t, len(t) AS n FROM toks),
         |s AS (SELECT doc_id, i,
         |    ('0x' || substr(md5(array_to_string(
         |      t[i : i + $spanLen - 1], ' ')), 1, 15))::BIGINT AS h,
         |    doc_id * 1000000000 + i AS key
         |  FROM (SELECT doc_id, t, unnest(range(1, greatest(n - $spanLen + 1, 0) + 1)) AS i
         |        FROM d)),
         |o AS (SELECT doc_id, i, key,
         |    min(key) OVER (PARTITION BY h) AS first FROM s),
         |m AS (SELECT DISTINCT doc_id, unnest(range(i, i + $spanLen)) AS p
         |      FROM o WHERE key > first),
         |rem AS (SELECT doc_id, list_sort(list(p)) AS rm FROM m GROUP BY doc_id)
         |SELECT d.doc_id, d.n::BIGINT AS n_before,
         |  coalesce(len(rm), 0)::BIGINT AS n_removed_toks,
         |  coalesce(len(list_filter(rm, p -> NOT list_contains(rm, p - 1))), 0)::BIGINT
         |    AS n_intervals,
         |  (d.n - coalesce(len(rm), 0))::BIGINT AS n_after,
         |  coalesce(array_to_string(list_filter(d.t,
         |    (x, p) -> rm IS NULL OR NOT list_contains(rm, p)), ' '), '') AS cleaned
         |FROM d LEFT JOIN rem ON d.doc_id = rem.doc_id
         |ORDER BY d.doc_id""".stripMargin)
  )
}
