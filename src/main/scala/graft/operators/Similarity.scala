package graft.operators

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — north-star extension surface.
  *
  * Three tiers, trading recall for scale:
  *   1. [[bruteTopK]] — exact: every query scores every vector. Fine when
  *      the query set is small (broadcast) and the corpus fits a scan;
  *      O(|Q|·n·d) work but perfectly parallel, no shuffle beyond the
  *      final top-k (window over qid partitions).
  *   2. [[ivfTopK]] — IVF-style: vectors are pre-assigned to coarse cells
  *      (here the `label` column stands in for a k-means coarse quantizer,
  *      which is how a real IVF index is built offline); each query probes
  *      only its own cell. Work drops by the cell count; recall depends on
  *      the quantizer.
  *   3. [[lshCosinePairs]] — random-hyperplane LSH for all-pairs search:
  *      sign-pattern buckets via deterministic hyperplanes, exact cosine
  *      verification within buckets. Candidate volume is O(n·tables),
  *      never O(n²).
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol).as("vid"), col(vecCol).as("v"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val scored = e.join(broadcast(q), col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), cosineSim(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "vid", "cos")
  }

  /** Exact top-k via the typed [[graft.functions.TopKAggregator]]: same
    * answer as [[bruteTopK]], but map partitions reduce to ≤ k candidates
    * per query BEFORE the exchange (partial aggregation) — the shuffle
    * carries O(|Q|·k·partitions) rows instead of all n·|Q| scored rows. */
  def aggTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val spark = emb.sparkSession
    GraftFunctions.register(spark)
    import spark.implicits._
    val e = emb.select(col(idCol).as("vid"), col(vecCol).as("v"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val scored = e.join(broadcast(q), col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), cosineSim(col("qv"), col("v")).as("cos"))
      .as[(Long, Long, Double)]
    val agg = new graft.functions.TopKAggregator(k)
    scored
      .groupByKey(_._1)
      .mapValues { case (_, vid, cos) => graft.functions.Scored(vid, cos) }
      .agg(agg.toColumn)
      .toDF("qid", "top")
      .select(col("qid"), explode(col("top")).as("s"))
      .select(col("qid"), col("s.vid").as("vid"), col("s.cos").as("cos"))
  }

  /** IVF top-k: probe only the query's coarse cell (`cellCol`). */
  def ivfTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, cellCol: String, k: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol).as("vid"), col(vecCol).as("v"), col(cellCol).as("cell"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"), col(cellCol).as("qcell"))
    val scored = e.join(broadcast(q), col("cell") === col("qcell") && col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), cosineSim(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "vid", "cos")
  }

  /** Multi-probe IVF top-k — the recall dial of an IVF index. Cells are
    * Voronoi regions of the codebook, so a query near a cell boundary has
    * true neighbors in adjacent cells that single-probe [[ivfTopK]] misses
    * by construction; each query here scores the (broadcast) codebook with
    * exact integer distances, takes its `nprobe` nearest cells, and runs
    * exact cosine top-k over the union of their inverted lists. Per-query
    * work is ~`nprobe/|cells|` of the corpus — the knob a 100 TB
    * deployment trades recall against scan volume with (`nprobe = |cells|`
    * degenerates to exact search).
    *
    * @param emb      original float vectors `(idCol, vecCol)` (cosine is
    *                 scored on these, not the quantized lattice)
    * @param assigned [[KMeansQuant.fit]] output `(vec_id, v, cid, dist)`
    * @param cents    [[KMeansQuant.centroidsAfter]] codebook `(cid, cv)`
    * @param queryPred predicate over `vec_id` selecting the query set */
  def ivfTopKProbe(emb: DataFrame, idCol: String, vecCol: String,
      assigned: DataFrame, cents: DataFrame, queryPred: Column,
      k: Int, nprobe: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val cells = assigned.select(col("vec_id"), col("cid"))
    val qs = assigned.where(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val wp = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cid"))
    val probes = qs.crossJoin(broadcast(cents))
      .select(col("qid"), col("cid"),
        KMeansQuant.sqDist(col("qv"), col("cv")).as("cdist"))
      .withColumn("pn", row_number().over(wp))
      .where(col("pn") <= nprobe)
      .select(col("qid"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    probes.join(cells.select(col("vec_id").as("vid"), col("cid")), "cid")
      .where(col("vid") =!= col("qid"))
      .join(emb.select(col(idCol).as("vid"), col(vecCol).as("ve")), "vid")
      .join(emb.select(col(idCol).as("qid"), col(vecCol).as("qe")), "qid")
      .select(col("qid"), col("vid"), cosineSim(col("qe"), col("ve")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("qid", "vid", "cos")
  }

  /** All-pairs cosine ≥ tau via random-hyperplane LSH: `tables` hash
    * tables of `bits` sign-bits each (±1 hyperplanes derived
    * deterministically from md5 of "t_j_i" — no RNG state, reproducible
    * across runs/executors AND by the SQL oracle, which replays the same
    * planes/buckets/verification); exact cosine verification on bucket
    * collisions.
    *
    * Recall for a pair at angle θ: 1-(1-(1-θ/π)^bits)^tables. Not exact —
    * callers wanting the exact answer use [[Dedup.embeddingCosinePairs]].
    */
  /** Exact integer ceil(log2(n)) via bit length of n-1. Deliberately NOT
    * floating-point log2: at exact powers of two `ceil(log(n)/log(2))` can
    * round to one-off across engines, and the SQL oracle must derive the
    * SAME width (its twin is `length(bin(greatest(n,2)-1))`). */
  def ceilLog2(n: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(math.max(n, 2L) - 1)

  /** Bucket width sized to the corpus (VERDICT r7 #2: a FIXED width is a
    * scale bug — random pairs collide per table at ~2^-bits, so candidates
    * grow ~n²/2^bits and a 12-bit table that is fine at 2 k vectors is
    * quadratic-shaped at 128 k). bits = ceil(log2(n)) + 1 keeps expected
    * bucket occupancy ~0.5 and candidate volume O(n·tables) at every n.
    * Floor 8 keeps tiny corpora from degenerating into one bucket; cap 28
    * keeps the bucket inside the kernel's 32-bit int. Recall at a fixed
    * angle falls as bits grow — hold a recall target by scaling `tables`
    * (formula in [[lshCosinePairs]]); the registered recall rows pin their
    * widths explicitly for exactly that reason. The formula is MEASURED at
    * the adaptive point ([[graft.LshRecallProbe]], SCALE.md): 18 bits on
    * 128 k vectors → recall 0.365/0.611/0.959 at 8/16/59 tables vs
    * analytic 0.380/0.616/0.971 — trust it to size `tables`. */
  def adaptiveBits(n: Long): Int = math.min(28, math.max(8, ceilLog2(n) + 1))

  /** [[lshCosinePairs]] with the bucket width derived from the corpus size
    * at call time — one count over the (already-scanned) id column, then the
    * standard construction. This is the registered/default entry point: the
    * fixed-width overload remains for callers pinning an explicit
    * bits/tables operating point. */
  def lshCosinePairsAuto(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double, tables: Int = 8): DataFrame = {
    val n = emb.select(col(idCol)).count()
    lshCosinePairs(emb, idCol, vecCol, tau, adaptiveBits(n), tables)
  }

  /** Tables count that holds `targetRecall` for a pair at `designCos`, at
    * width `bits`: `ceil(ln(1-target) / ln(1-p))` with `p = (1-θ/π)^bits`
    * — the analytic model measured trustworthy within ~1 pp at 12, 10 and
    * 18 bits ([[graft.LshRecallProbe]], SCALE.md round 9). Capped at
    * `maxTables`: required tables roughly double per ladder rung (+2 bits
    * per 4× n); past the cap, hold recall by re-chunking or a better
    * embedding rather than hashing harder. */
  def tablesForRecall(bits: Int, targetRecall: Double = 0.95,
      designCos: Double = 0.9, maxTables: Int = 128): Int = {
    require(targetRecall > 0.0 && targetRecall < 1.0, "targetRecall must be in (0,1)")
    val p = math.pow(1.0 - math.acos(math.min(1.0, designCos)) / math.Pi, bits)
    val raw = math.log(1.0 - targetRecall) / math.log(1.0 - p)
    // Cross-engine guard: the SQL oracle replays this ceil through DuckDB's
    // libm, and a 1-ulp acos/log/pow divergence near an integer boundary
    // would flip the count and silently hash-mismatch the row — fail loudly
    // here instead. Boundaries at/above the cap are harmless (both engines
    // clamp to maxTables, so a flip across that edge cancels).
    require(raw >= maxTables - 0.5 || math.abs(raw - math.rint(raw)) > 1e-6,
      f"tablesForRecall: ceil argument $raw%.9f sits within 1e-6 of an integer " +
        "boundary; nudge targetRecall/designCos or pin tables explicitly")
    math.min(maxTables, math.max(1, math.ceil(raw).toInt))
  }

  /** [[lshCosinePairsAuto]] with the TABLES dial also derived — from a
    * recall contract instead of a fixed count. Bits size the candidate
    * volume (occupancy ~0.5, candidates O(n·tables)); tables then hold
    * `targetRecall` for pairs at the `designCos` operating angle. Both
    * derivations use arithmetic the SQL oracle replays exactly
    * (`q_ann_lsh_target`), so the scale AND recall configuration are
    * oracle-checked at every sf. */
  def lshCosinePairsRecall(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double, targetRecall: Double = 0.95, designCos: Double = 0.9): DataFrame = {
    val n = emb.select(col(idCol)).count()
    val bits = adaptiveBits(n)
    lshCosinePairs(emb, idCol, vecCol, tau, bits,
      tablesForRecall(bits, targetRecall, designCos))
  }

  /** Random-projection coarse search + exact rerank: project every vector
    * to `r` dims with a deterministic signed (±1) JL projection, take each
    * query's top-`m` candidates by PROJECTED cosine, then rerank just
    * those `m` by exact full-width cosine and keep the top `k`.
    *
    * The 100 TB shape: the coarse pass scans `r`-dim projections instead
    * of `d`-dim vectors (r≪d — a production 1536-dim embedding at r=16 is
    * ~100× fewer scored bytes), the coarse top-m uses map-side bounded
    * heaps ([[graft.functions.TopKAggregator]]) so the only corpus-wide
    * exchange carries O(|Q|·m·partitions) rows, and full-width vectors are
    * ever touched for only the m·|Q| surviving candidate ids (broadcast
    * back against the corpus). Recall is the JL distortion dial: raise `r`
    * (tighter projection) or `m` (deeper rerank pool); m = |corpus|
    * degenerates to exact search. */
  def rpTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, r: Int, m: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    GraftFunctions.register(spark)
    import spark.implicits._
    val e = emb.select(col(idCol).as("vid"), randProject(col(vecCol), r).as("pv"))
    val q = queries.select(col(idCol).as("qid"), randProject(col(vecCol), r).as("qpv"))
    val coarse = e.join(broadcast(q), col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), cosineSimD(col("qpv"), col("pv")).as("pcos"))
      .as[(Long, Long, Double)]
    val agg = new graft.functions.TopKAggregator(m)
    val cand = coarse
      .groupByKey(_._1)
      .mapValues { case (_, vid, pcos) => graft.functions.Scored(vid, pcos) }
      .agg(agg.toColumn)
      .toDF("qid", "top")
      .select(col("qid"), explode(col("top.vid")).as("vid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    emb.select(col(idCol).as("vid"), col(vecCol).as("ve"))
      .join(broadcast(cand), "vid")
      .join(broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qe"))), "qid")
      .select(col("qid"), col("vid"), cosineSim(col("qe"), col("ve")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("qid", "vid", "cos")
  }

  /** Sign-bit bucket rows `(vec_id, tbl, bucket)` for `(vec_id, v)`
    * input: bit j of table t's bucket = sign(dot(v, plane(t, j))), planes
    * md5-derived (oracle-replayable). Shared by the all-pairs LSH, the
    * kNN graph and its incremental maintenance. */
  private[graft] def signBuckets(e: DataFrame, bits: Int, tables: Int): DataFrame =
    e.select(col("vec_id"),
      posexplode(transform(sequence(lit(0), lit(tables - 1)),
        t => call_function("graft_hyperplane_bucket_md5", col("v"), t, lit(bits)))))
      .toDF("vec_id", "tbl", "bucket")

  def lshCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double, bits: Int = 12, tables: Int = 8): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    // sign-bit bucket per (table): bit j = sign(dot(v, plane(t, j))).
    // The vector is consumed by the bucket hash and DROPPED here: the
    // candidate self-join and the cross-table dedup distinct move only
    // (id, tbl, bucket) / (va, vb) — at 100 TB the full embedding payload
    // through those two shuffles would dominate the job's bytes (each
    // candidate pair appears once per colliding table before the dedup).
    val bucketed = signBuckets(e, bits, tables)
    val cand = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .distinct()
    // vectors re-joined ONLY for the surviving unique pairs (O(n·tables)
    // candidates, each vector fetched once per side)
    cand
      .join(e.select(col("vec_id").as("va"), col("v").as("va_v")), "va")
      .join(e.select(col("vec_id").as("vb"), col("v").as("vb_v")), "vb")
      .select(col("va"), col("vb"), cosineSim(col("va_v"), col("vb_v")).as("cos"))
      .where(col("cos") >= tau)
  }

  /** k-NN GRAPH construction: every vector's top-`k` LSH-candidate
    * neighbors by exact cosine — the precursor artifact of SemDeDup-style
    * semantic clustering, mutual-kNN dedup and graph-based diversity
    * sampling, where EVERY corpus vector is simultaneously a query.
    *
    * Unlike the query-set ANN rows ([[bruteTopK]] broadcasts |Q| vectors —
    * impossible when Q = the corpus), the graph reuses the all-pairs LSH
    * machinery: candidates come from [[lshCosinePairsAuto]]'s sign-bucket
    * collisions at tau = −1 (no cosine floor — the graph keeps weak
    * neighbors too, candidate volume stays O(n·tables) by bucket-width
    * construction), each undirected candidate pair is exploded into BOTH
    * directed orientations IN ONE PASS (the scored cosine is computed once
    * and reused — also what makes the value orientation-stable), and a
    * per-source window keeps the top k by (cos DESC, dst). Shuffles move
    * (src, dst, cos) triples only — never embeddings; per-node candidate
    * counts are bounded by the adaptive bucket sizing, so the window
    * partition never degenerates. Recall contract = the LSH table: a true
    * neighbor never sharing a bucket is absent by construction — the
    * oracle replays the identical md5-derived planes, so the approximation
    * itself is the cross-checked artifact. */
  def knnGraph(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      tables: Int = 8): DataFrame =
    topKDirected(
      lshCosinePairsAuto(emb, idCol, vecCol, tau = -1.0, tables), k)

  /** Both directed orientations of undirected scored pairs `(va, vb,
    * cos)` in ONE pass, then the per-source top-k window. Shared by
    * [[knnGraph]] and [[knnGraphIncremental]]. */
  private def topKDirected(pairs: DataFrame, k: Int): DataFrame = {
    val sym = pairs
      .select(explode(array(
        struct(col("va").as("src"), col("vb").as("dst")),
        struct(col("vb").as("src"), col("va").as("dst")))).as("e"), col("cos"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("cos"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    sym.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("src"), col("dst"), col("cos"), col("rank").cast("long").as("rank"))
  }

  /** INCREMENTAL k-NN graph maintenance: merge a `deltaPred` batch of new
    * vectors into the standing graph without recomputing corpus×corpus —
    * the nightly-ingest shape for every kNN-graph consumer (SemDeDup,
    * mutual-kNN dedup, diversity sampling). Per batch:
    *
    *   1. the standing graph G₀ = top-k over corpus×corpus LSH candidates
    *      (the artifact a deployment already has on disk);
    *   2. delta-touching candidates ONLY: delta rows bucket-join the FULL
    *      table — cost ∝ |delta|·tables + its collisions, never corpus²;
    *   3. merged per-source top-k over G₀'s edges ∪ the new directed
    *      pairs.
    *
    * The merge is EXACT, not approximate: a full-recompute neighbor of a
    * corpus node is either a delta node (step 2 generates it) or a corpus
    * node — and corpus×corpus candidates are IDENTICAL in both passes
    * (planes depend only on (table, bit, dim); the bucket width is pinned
    * from the FULL corpus count so both passes hash alike), so any
    * corpus neighbor ranking in the full top-k already ranks in G₀'s
    * top-k. Hence the registered oracle is the FULL-GRAPH recompute
    * (q_knn_graph's SQL verbatim) — the incremental algebra itself is the
    * cross-checked artifact, the `q_ivm_agg`/`q_ivm_join` discipline
    * extended to a similarity index. */
  def knnGraphIncremental(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, deltaPred: Column, tables: Int = 8): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val n = emb.select(col(idCol)).count()
    val bits = adaptiveBits(n)
    val all = emb.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      deltaPred.as("is_delta"))
    val corpus = all.where(!col("is_delta")).select(col("vec_id"), col("v"))
    val g0 = topKDirected(
      lshCosinePairs(corpus, "vec_id", "v", tau = -1.0, bits, tables), k)
      .select(col("src"), col("dst"), col("cos"))
    val bAll = signBuckets(all.select(col("vec_id"), col("v")), bits, tables)
    val bDelta = signBuckets(
      all.where(col("is_delta")).select(col("vec_id"), col("v")), bits, tables)
    val candNew = bDelta.as("a")
      .join(bAll.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(least(col("a.vec_id"), col("b.vec_id")).as("va"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("vb"))
      .distinct()
    val e = all.select(col("vec_id"), col("v"))
    val scoredNew = candNew
      .join(e.select(col("vec_id").as("va"), col("v").as("va_v")), "va")
      .join(e.select(col("vec_id").as("vb"), col("v").as("vb_v")), "vb")
      .select(col("va"), col("vb"),
        GraftFunctions.cosineSim(col("va_v"), col("vb_v")).as("cos"))
    val newDirected = scoredNew
      .select(explode(array(
        struct(col("va").as("src"), col("vb").as("dst")),
        struct(col("vb").as("src"), col("va").as("dst")))).as("e2"), col("cos"))
      .select(col("e2.src").as("src"), col("e2.dst").as("dst"), col("cos"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    g0.unionAll(newDirected)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("src"), col("dst"), col("cos"), col("rank").cast("long").as("rank"))
  }
}
