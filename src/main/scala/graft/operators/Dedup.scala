package graft.operators

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora (north-star extension —
  * the reference has no dedup surface at all, SURVEY.md §2.4).
  *
  * Scale design (100 TB):
  *   - Exact dedup is one hash-shuffle on the dedup key (map-side partial
  *     aggregation first); dedup on a digest (`md5(text)`) keeps shuffle
  *     rows narrow instead of shuffling full documents.
  *   - N-gram Jaccard uses an inverted-index self-join on shingles: only
  *     documents sharing a shingle ever meet, so there is no O(n²)
  *     cross join. Skew (ultra-common shingles) is the known hazard; the
  *     mitigation at scale is document-frequency prefix filtering (drop
  *     shingles with df > cutoff — they cannot be discriminative) plus AQE
  *     skew-join splitting. Kept exact here because the correctness oracle
  *     is exact Jaccard.
  *   - MinHash+LSH replaces the full inverted index with `bands` bucket
  *     joins over 8-byte band hashes: shuffle volume is O(n * bands), and
  *     only bucket-colliding candidates are verified exactly. With 128
  *     hashes in 32 bands of 4, recall at J ≥ 0.9 is 1-(1-0.9⁴)³² ≈ 1-3e-15
  *     — the verified output equals the exact answer with overwhelming
  *     probability, which is why it shares the exact oracle.
  *   - SimHash reduces each document to 8 bytes; candidates share one of
  *     four 16-bit blocks (pigeonhole: Hamming ≤ 3 ⇒ some block equal),
  *     then exact Hamming verification via `bit_count(a ^ b)`.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical value of `keyCols`. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))

  /** Per-document distinct shingle set, represented as 8-byte xxhash64
    * values computed ROW-LOCALLY (no shuffle): `(doc_id, ss: array<long>,
    * n: int)`. Joining/intersecting on 8-byte hashes instead of shingle
    * strings shrinks shuffle volume several-fold; a 64-bit collision
    * (≈ |shingles|²/2⁶⁴) is the accepted, negligible error. */
  private[graft] def shingleSets(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .select(col("doc_id"),
        array_distinct(transform(shingles(col("t"), k), s => xxhash64(s))).as("ss"))
      .select(col("doc_id"), col("ss"), size(col("ss")).as("n"))

  /** The PPJoin prefix bound ⌈n·tau⌉, computed in DECIMAL arithmetic so it
    * is exact for every decimal tau (ADVICE r15: `ceil` over the DOUBLE
    * product can overstate by 1 when tau's binary representation exceeds
    * the decimal — e.g. a future caller's tau whose double sits just above
    * the rational — which SHORTENS the prefix and silently drops candidate
    * pairs, a recall loss invisible to spot checks). `tau.toString` recovers
    * the intended decimal (shortest round-trip repr), `n · decimal` is
    * exact, and Spark's `ceil(decimal)` is exact — matching the SQL
    * oracles' integer-style ceiling. */
  private def ceilTau(n: Column, tau: Double): Column =
    ceil(n * lit(BigDecimal(java.lang.Double.toString(tau))))

  /** Exact pairwise n-gram Jaccard ≥ tau via PREFIX-FILTERED inverted
    * index (AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    * WWW'08). Output: (da, db, jac) with da < db.
    *
    * The Σdf² hazard of a full inverted index (ultra-common shingles make
    * candidate volume quadratic in their document frequency) is removed
    * structurally, with recall exactly 1:
    *
    *   - order every document's shingle set by GLOBAL (df, hash) ascending
    *     — rarest first;
    *   - index only each document's first `|S| − ⌈tau·|S|⌉ + 1` shingles
    *     (its prefix). PPJoin Lemma 1: J(A,B) ≥ tau implies
    *     |A∩B| ≥ ⌈tau·max(|A|,|B|)⌉, and two sets whose intersection is
    *     that large MUST intersect within these prefixes under any shared
    *     total order — so candidate generation over prefixes alone misses
    *     nothing;
    *   - verify every candidate with the full shingle sets (exact
    *     intersection), so precision is exact too.
    *
    * Rarest-first ordering concentrates prefixes on discriminative
    * shingles: a shingle appearing in half the corpus lands in almost no
    * prefixes, so its df² pair explosion never happens. Plan shape: one
    * df aggregation, one rank window (both shuffle narrow rows), one
    * prefix self-join, one verification join against the persisted sets.
    *
    * Storage ownership (VERDICT r15 #5): this convenience wrapper owns its
    * shingle-set persistence — persist, RUN (the bounded verified pair set
    * is materialized eagerly via `localCheckpoint`, cutting the lineage
    * back to the sets frame), unpersist. Nothing stays pinned in the
    * session's cache manager after the call returns; the checkpointed pair
    * blocks are released by the ContextCleaner when the returned frame is
    * dropped. Long-lived sessions deduping MANY distinct corpora — or
    * callers wanting a LAZY plan — should use [[ngramJaccardPairsFrom]]
    * with a frame whose persistence they manage, as the registered queries
    * do via `SessionCache`. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, tau: Double): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try ngramJaccardPairsFrom(sets, tau).localCheckpoint()
    finally sets.unpersist()
  }

  /** [[ngramJaccardPairs]] over a precomputed `(doc_id, ss, n)` shingle-set
    * frame (caller owns its persistence — the frame is read by the prefix
    * pass and both sides of the verification join, so it should be
    * persisted). Lets the caller share ONE tokenize→shingle scan between
    * this and [[minhashPairsFrom]]. */
  def ngramJaccardPairsFrom(sets: DataFrame, tau: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = sets.select(col("doc_id"), col("n"), explode(col("ss")).as("h"))
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefix = sh.join(dfreq, "h")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
      .where(col("rk") <= col("n") - ceilTau(col("n"), tau) + 1)
      .select(col("doc_id"), col("h"))
      .repartition(col("h")) // one exchange, reused by both self-join sides
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    jaccardVerify(cand, sets, tau)
  }

  /** Exact-Jaccard verification shared by the candidate generators (r19):
    * attach both shingle sets, drop pairs the LENGTH FILTER already
    * refutes (J ≥ tau ⟹ inter ≥ tau·max(na,nb) and inter ≤ min(na,nb),
    * so min(na,nb) ≥ ⌈tau·max⌉ is necessary — integer inter makes the
    * ceil exact; zero false negatives), and count the intersection with
    * the allocation-free [[graft.functions.TextHashes.interCount]] kernel
    * evaluated ONCE per pair (`size(array_intersect(..))` appeared twice
    * in the Jaccard formula and allocates the intersection array each
    * time). Values bit-identical: the sets are distinct by construction,
    * so membership count ≡ intersection size. */
  private def jaccardVerify(cand: DataFrame, sets: DataFrame,
      tau: Double): DataFrame = {
    GraftFunctions.register(sets.sparkSession)
    val Seq(da, db) = cand.columns.toSeq.map(col)
    cand
      .join(sets.select(col("doc_id"), col("ss").as("ssa"), col("n").as("na")),
        da === col("doc_id")).drop("doc_id")
      .join(sets.select(col("doc_id"), col("ss").as("ssb"), col("n").as("nb")),
        db === col("doc_id")).drop("doc_id")
      .where(least(col("na"), col("nb")) >=
        ceilTau(greatest(col("na"), col("nb")), tau))
      .select(da, db, interCount(col("ssa"), col("ssb")).as("inter"),
        col("na"), col("nb"))
      .select(da, db,
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter"))).as("jac"))
      .where(col("jac") >= tau)
  }

  /** Directed near-dup CONTAINMENT pairs: C(A→B) = |A∩B| / |A| ≥ tau —
    * the asymmetric complement of Jaccard resemblance. A short document
    * quoted wholesale inside a long one has containment ≈ 1 but Jaccard
    * ≈ |A|/|B| (arbitrarily small), so [[ngramJaccardPairsFrom]] misses
    * exactly the quote-inclusion duplicates a web corpus is full of; this
    * operator is the detector for them.
    *
    * Prefix filtering adapts to the asymmetry (PPJoin Lemma 1, containment
    * form): |A∩B| ≥ ⌈tau·|A|⌉ means at most |A| − ⌈tau·|A|⌉ of A's
    * shingles miss B, so under any shared total order A's first
    * |A| − ⌈tau·|A|⌉ + 1 shingles must intersect B — the CONTAINED side
    * indexes only its prefix, but the container side must index ALL its
    * shingles (no size bound exists on B). Candidates are therefore
    * prefix × full-postings joins, still concentrated on rare shingles by
    * the df-ascending prefix order; exact intersection verification makes
    * recall AND precision exact, which is what the all-pairs SQL oracle
    * checks. Output: directed `(da, db, inter, na, cont)` — da contained
    * in db. */
  def containmentPairsFrom(sets: DataFrame, tau: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(sets.sparkSession)
    val sh = sets.select(col("doc_id"), col("n"), explode(col("ss")).as("h"))
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefix = sh.join(dfreq, "h")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
      .where(col("rk") <= col("n") - ceilTau(col("n"), tau) + 1)
      .select(col("doc_id"), col("h"))
    val postings = sh.select(col("doc_id"), col("h")).repartition(col("h"))
    val cand = prefix.repartition(col("h")).as("a")
      .join(postings.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    // r19 verification: the directed LENGTH FILTER (C ≥ tau ⟹ inter ≥
    // ⌈tau·na⌉ and inter ≤ nb, so nb ≥ ⌈tau·na⌉ — exact, no false
    // negatives) drops refutable candidates before any intersection, and
    // the interCount kernel counts the remainder without allocating
    // intersection arrays (ContainProbe: verification was 1.65 s of the
    // row's 1.74 s at 133 k candidates / 505 survivors).
    cand
      .join(sets.select(col("doc_id"), col("ss").as("ssa"), col("n").as("na")),
        col("da") === col("doc_id")).drop("doc_id")
      .join(sets.select(col("doc_id"), col("ss").as("ssb"), col("n").as("nb")),
        col("db") === col("doc_id")).drop("doc_id")
      .where(col("nb") >= ceilTau(col("na"), tau))
      .select(col("da"), col("db"),
        interCount(col("ssa"), col("ssb")).as("inter"),
        col("na").cast("long").as("na"))
      .withColumn("cont", col("inter").cast("double") / col("na"))
      .where(col("cont") >= tau)
  }

  /** [[corpusOverlap]]'s slot-hash modulus (2³¹ − 1, prime) and per-slot
    * universal-hash constants aᵢ ∈ [1, p−1], bᵢ ∈ [0, p−1] — md5-derived
    * exactly as the SQL oracle recomputes them (first 15 hex chars of the
    * digest = the md5-60 kernel's value). */
  private val OverlapP = 2147483647L
  private def md560(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15), 16)
  private val OverlapA: Seq[Long] =
    (0 until 64).map(i => md560(s"sl_a_$i") % (OverlapP - 1) + 1)
  private val OverlapB: Seq[Long] =
    (0 until 64).map(i => md560(s"sl_b_$i") % OverlapP)

  /** CORPUS-level resemblance between SOURCES (r16) — the triage step
    * before any cross-corpus dedup: estimate the Jaccard overlap of two
    * crawls'/dumps' shingle SETS from mergeable per-source MinHash
    * sketches, so the expensive pairwise near-dup pass only runs on source
    * pairs whose corpus overlap justifies it. Output per source pair
    * (src_a < src_b): set sizes, the EXACT set Jaccard, the sketch
    * estimate, and their absolute error.
    *
    * The sketch is the scale path: per source it is `positions` longs —
    * a commutative, mergeable (element-wise min) monoid, so at 100 TB
    * each source's signature comes from ONE scan with map-side partial
    * mins and the overlap decision never touches pairwise data. The exact
    * Jaccard computed alongside exists as the harness cross-check (and is
    * itself bounded by distinct shingles, never documents²). The estimator
    * is the classic one-permutation-per-slot bound: each of the
    * `positions` slots agrees between two sources with probability
    * J(A,B), so the match fraction is an unbiased estimate with stderr
    * √(J(1−J)/positions).
    *
    * Slot hashes are the textbook UNIVERSAL family hᵢ(x) = (aᵢ·x + bᵢ)
    * mod p over p = 2³¹−1, with x = md5-60(shingle) mod p and the 64
    * (aᵢ, bᵢ) constants md5-derived — distinct per slot, so slots are
    * (pairwise-)independent. A Kirsch-Mitzenmacher h1 + i·h2 WITHOUT the
    * 2⁶⁴ wraparound was measured catastrophically slot-correlated here
    * (the global-min-x element stays the min across most slots, inflating
    * a 0.02-Jaccard pair's estimate to 0.56); the JVM's wrapping fixes
    * K-M but DuckDB errors on int64 overflow, so the oracle could not
    * replay it. With 31-bit operands, aᵢ·x ≤ 2⁶² — overflow-free on both
    * engines, bit-for-bit replayable. */
  def corpusOverlap(docs: DataFrame, srcCol: String, textCol: String,
      k: Int = 3, positions: Int = 64): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // r18 shape (same values bit-for-bit, oracle unchanged). One exchange
    // keyed by shingle carries EVERYTHING: groupBy(s).collect_set(src)
    // subsumes the old (src,s) distinct, md5 runs once per distinct
    // shingle (not per (src,s) row), and the old shingle-string self-join
    // for the exact intersection becomes pair enumeration over each
    // shingle's source set (|srcs| is a handful; the set is tiny by
    // construction). The old 64-slot posexplode — 64× every distinct
    // (src,s) row materialized through a projection — is now 64 plain
    // min() aggregate columns over one exploded (src, x) pass: declarative
    // aggregates, whole-stage codegen, map-side partial mins, and the
    // exchange input after partial agg is |src| rows.
    // r19: spread the tokenize/shingle/explode scan across the cluster —
    // the sigSetsPlan discipline. The documents table arrives as ONE
    // parquet split at harness scale, so without this the CPU-heavy scan
    // (measured 3.27 s of the row's 4.0 s total, OverlapProbe) runs in a
    // single task while 31 cores idle; one round-robin exchange of the
    // raw text (MBs) buys full-width parallelism. At 100 TB the input
    // arrives in thousands of splits and the repartition is a no-op cost
    // (still ~32 MB/slice of raw text through the exchange, once).
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val perS = docs.repartition(parts)
      .select(col(srcCol).as("src"),
        explode(shingles(tokens(col(textCol)), k)).as("s"))
      .groupBy(col("s")).agg(collect_set(col("src")).as("srcs"))
      .select(pmod(md5Hash60(col("s")), lit(OverlapP)).as("x"),
        sort_array(col("srcs")).as("srcs"))
    // per-source: distinct-shingle count + the 64 slot minima in ONE agg
    val minCols = (0 until positions).map(i =>
      min(pmod(lit(OverlapA(i)) * col("x") + lit(OverlapB(i)),
        lit(OverlapP))).as(s"m$i"))
    val aggCols = count(lit(1)).as("n") +: minCols
    val sig = perS.select(explode(col("srcs")).as("src"), col("x"))
      .groupBy(col("src"))
      .agg(aggCols.head, aggCols.tail: _*)
    // exact pairwise intersections: each shingle contributes one count to
    // every ordered pair within its source set
    val inter = perS
      .select(explode(flatten(transform(col("srcs"), (a, i) =>
        transform(slice(col("srcs"), i + 2, size(col("srcs"))),
          b => struct(a.as("src_a"), b.as("src_b")))))).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    val matches = (0 until positions).map(i =>
      when(col(s"a.m$i") === col(s"b.m$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    sig.as("a")
      .join(sig.as("b"), col("a.src") < col("b.src"))
      .select(col("a.src").as("src_a"), col("b.src").as("src_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        (matches.cast("double") / positions).as("est_jaccard"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("inter"), lit(0L)))).as("exact_jaccard"),
        col("est_jaccard"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("exact_jaccard")))
  }

  /** MinHash+LSH near-dup pairs, exact-verified: shingle → 128-hash MinHash
    * signature → 32 band buckets → bucket-join candidates → exact Jaccard
    * filter. Output: (da, db, jac), same contract as [[ngramJaccardPairs]].
    */
  /** One tokenize→shingle scan producing BOTH the MinHash signature and the
    * distinct shingle-hash set: `(doc_id, sig, ss, n)`, persisted. This is
    * the shared expensive pass — [[minhashPairsFrom]] reads `sig` for
    * banding and `ss` for verification; [[ngramJaccardPairsFrom]] reads
    * `ss`/`n` — so callers running several dedup flavors over the same
    * corpus pay the scan once. Size is bounded: per doc one signature
    * (numHashes longs) + the distinct shingle hashes — a few KB per
    * document, independent of raw document length.
    *
    * Returned frame is persisted MEMORY_AND_DISK; the CALLER owns its
    * lifecycle (`unpersist()` when the last consumer has materialized).
    * The registered queries route through `SessionCache`, which memoizes
    * one frame per session and evicts it on application end. */
  def shingleSigSets(docs: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int = 128): DataFrame =
    sigSetsPlan(docs, idCol, textCol, k, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** The [[shingleSigSets]] plan WITHOUT the persist side effect — for
    * callers (and specs) that need the pure plan. */
  private[graft] def sigSetsPlan(docs: DataFrame, idCol: String,
      textCol: String, k: Int, numHashes: Int = 128): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // spread the CPU-heavy tokenize/shingle/sign work across the cluster
    // even when the source arrives in few coarse splits (one shuffle of the
    // raw text, paid once per corpus, vs single-task hashing)
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    docs.repartition(parts)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .select(col("doc_id"), shingles(col("t"), k).as("sharr"))
      .select(col("doc_id"),
        minhashSig(col("sharr"), numHashes).as("sig"),
        array_distinct(transform(col("sharr"), s => xxhash64(s))).as("ss"))
      .select(col("doc_id"), col("sig"), col("ss"), size(col("ss")).as("n"))
  }

  /** Convenience wrapper; same storage ownership as [[ngramJaccardPairs]]:
    * persist the [[shingleSigSets]] frame, materialize the bounded verified
    * pair set eagerly, unpersist — nothing stays in the session's cache
    * manager. Callers wanting a lazy plan or cross-flavor scan sharing use
    * [[minhashPairsFrom]] and manage the frame themselves. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, tau: Double, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val sets = shingleSigSets(docs, idCol, textCol, k, numHashes)
    try minhashPairsFrom(sets, tau, bands).localCheckpoint()
    finally sets.unpersist()
  }

  /** [[minhashPairs]] over a precomputed [[shingleSigSets]] frame. */
  def minhashPairsFrom(sets: DataFrame, tau: Double, bands: Int = 32): DataFrame = {
    // Everything per-row until the band bucket join: signature AND shingle
    // set were computed inside the scan stage, zero shuffle (MinHash is
    // multiplicity-insensitive, so no distinct was needed before signing).
    // Rows-per-band derives from the signature the sets frame carries.
    val sig = sets.select(col("doc_id"), col("sig"))
    val rows = (size(col("sig")) / bands).cast("int")
    val bandTbl = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rows + lit(1), rows)))))
      .toDF("doc_id", "band", "bh")
      .repartition(col("band"), col("bh")) // one exchange, reused by both join sides
    val cand = bandTbl.as("a")
      .join(bandTbl.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()

    jaccardVerify(cand, sets, tau)
  }

  /** Cross-corpus MinHash+LSH near-dup pairs: every `(new, corpus)` pair
    * with exact-verified Jaccard ≥ tau — the INCREMENTAL dedup shape: an
    * incoming batch is matched against the standing corpus without ever
    * re-pairing the corpus with itself. Band buckets come from the same
    * signatures as [[minhashPairsFrom]]; the bucket join is new-side ×
    * corpus-side only (no self-pairs on either side), so at 100 TB the
    * candidate volume is ∝ |batch| · bucket occupancy, not corpus².
    * Output: (dn, dc, jac). */
  def minhashPairsAcross(newSets: DataFrame, corpusSets: DataFrame,
      tau: Double, bands: Int = 32): DataFrame = {
    def bandTbl(sets: DataFrame): DataFrame = {
      val sig = sets.select(col("doc_id"), col("sig"))
      val rows = (size(col("sig")) / bands).cast("int")
      sig.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rows + lit(1), rows)))))
        .toDF("doc_id", "band", "bh")
        .repartition(col("band"), col("bh"))
    }
    val cand = bandTbl(newSets).as("a")
      .join(bandTbl(corpusSets).as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a.doc_id").as("dn"), col("b.doc_id").as("dc"))
      .distinct()
    // same verification discipline as [[jaccardVerify]] (length filter +
    // single interCount), spelled out because the two sides come from
    // DIFFERENT set frames
    GraftFunctions.register(newSets.sparkSession)
    cand
      .join(newSets.select(col("doc_id"), col("ss").as("ssa"), col("n").as("na")),
        col("dn") === col("doc_id")).drop("doc_id")
      .join(corpusSets.select(col("doc_id"), col("ss").as("ssb"), col("n").as("nb")),
        col("dc") === col("doc_id")).drop("doc_id")
      .where(least(col("na"), col("nb")) >=
        ceilTau(greatest(col("na"), col("nb")), tau))
      .select(col("dn"), col("dc"),
        interCount(col("ssa"), col("ssb")).as("inter"), col("na"), col("nb"))
      .select(col("dn"), col("dc"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter"))).as("jac"))
      .where(col("jac") >= tau)
  }

  /** SimHash near-dup candidate pairs with exact Hamming verification.
    * Hamming ≤ maxHamming requires maxHamming+1 blocks for the pigeonhole
    * guarantee; we use 4 15-bit blocks of the 60-bit md5-based simhash
    * (exact for maxHamming ≤ 3). The md5-60 token hash makes the whole
    * pipeline reproducible by the SQL oracle (TextHashes.simhash60).
    * Output: (da, db, hamming). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block LSH is exact only for Hamming <= 3")
    GraftFunctions.register(docs.sparkSession)
    val sigs = docs.select(col(idCol).as("doc_id"),
      simhash60(tokens(col(textCol))).as("sh"))
    val blocks = sigs.select(col("doc_id"), col("sh"),
      posexplode(array((0 to 3).map(b =>
        shiftrightunsigned(col("sh"), b * 15).bitwiseAND(lit(0x7FFFL))): _*)))
      .toDF("doc_id", "sh", "blk", "bv")
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Image near-dup candidate pairs via perceptual hashing (dHash over REAL
    * decoded pixels — [[graft.functions.PerceptualHash]]), with exact
    * Hamming verification: the image leg of the near-dedup family (resized/
    * recompressed duplicate images are the dominant redundancy in web-scale
    * multimodal corpora). Same LSH shape as [[simhashPairs]]: the 64-bit
    * hash (as two unsigned 32-bit halves, `dh = [lo, hi]`) splits into four
    * 16-bit blocks; pigeonhole makes block-equality candidates EXACT for
    * Hamming ≤ 3, then `bit_count(xor)` verifies. Undecodable payloads
    * (empty hash) drop out before banding.
    *
    * 100 TB shape: decode→pool→hash is one zero-shuffle codegen projection
    * over the scan; the only shuffle is the banded candidate join keyed on
    * (block, 16-bit value) — candidates ∝ bucket occupancy (near-dup
    * density), never corpus². Output: (da, db, hamming). */
  def dhashPairs(imgs: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 3): DataFrame = {
    GraftFunctions.register(imgs.sparkSession)
    val sigs = imgs
      .select(col(idCol).as("doc_id"), dhash(col(blobCol)).as("dh"))
      .where(size(col("dh")) === 2)
      .select(col("doc_id"),
        element_at(col("dh"), 1).as("lo"), element_at(col("dh"), 2).as("hi"))
    hamming64Pairs(sigs, maxHamming)
  }

  /** Banded 4×16-bit LSH pairing over ANY 64-bit signature carried as two
    * u32 halves `(doc_id, lo, hi)` — the shared candidate machinery behind
    * [[dhashPairs]] (image dHash) and the audio fingerprint
    * (`AudioCodec.audioFp`). Pigeonhole-exact for Hamming ≤ 3: a pair
    * within the threshold differs in ≤ 3 of the 4 blocks, so at least one
    * block matches and the pair is seen by the banded join. Only shuffle:
    * the (block, 16-bit value)-keyed candidate join — occupancy-
    * proportional, never corpus². */
  def hamming64Pairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block LSH is exact only for Hamming <= 3")
    // The banded join below reads `sigs` TWICE (self-join) — without a
    // materialization barrier the upstream signature chain (payload
    // synthesis + decode + hash kernels, the expensive part for image and
    // audio callers) executes once per side. Checkpointing the (doc_id,
    // lo, hi) triples is O(24 B/row) regardless of payload size — the
    // decode runs exactly once. (Measured on q_mm_dedup_image at sf0.1:
    // part of the 10.4 s -> sub-second fix, with the pre-synth
    // repartition at the callers.)
    val mat = sigs.localCheckpoint()
    val blocks = mat.select(col("doc_id"), col("lo"), col("hi"),
      posexplode(array(
        col("lo").bitwiseAND(lit(0xFFFFL)),
        shiftrightunsigned(col("lo"), 16).bitwiseAND(lit(0xFFFFL)),
        col("hi").bitwiseAND(lit(0xFFFFL)),
        shiftrightunsigned(col("hi"), 16).bitwiseAND(lit(0xFFFFL)))))
      .toDF("doc_id", "lo", "hi", "blk", "bv")
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        (bit_count(col("a.lo").bitwiseXOR(col("b.lo"))) +
          bit_count(col("a.hi").bitwiseXOR(col("b.hi")))).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Banded pairing over 128-BIT signatures carried as four u32 words
    * `(doc_id, w0..w3)` — the WIDE-signature scale path of
    * [[hamming64Pairs]] (r15): 4 bands of 32 bits each, pigeonhole-exact
    * for Hamming ≤ 3 exactly like the 4×16 banding, but the band-value
    * space grows 2¹⁶ → 2³², so birthday-collision candidates fall from
    * Θ(n²/2¹⁶) (superlinear past ~10⁶ items — the failure mode the video
    * leg's x64 rung measured) to Θ(n²/2³³) — negligible to ~10⁹ items.
    * Pairs with the 128-bit [[graft.functions.PerceptualHash.dhash128]].
    * Only shuffle: the (band, 32-bit value)-keyed candidate join.
    * Output: (da, db, hamming). */
  def hamming128Pairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x32-bit banding is exact only for Hamming <= 3")
    val mat = sigs.localCheckpoint() // one signature materialization (see hamming64Pairs)
    val blocks = mat.select(
      col("doc_id") +: (0 to 3).map(i => col(s"w$i")) :+
        posexplode(array((0 to 3).map(i => col(s"w$i")): _*)): _*)
      .toDF("doc_id", "w0", "w1", "w2", "w3", "blk", "bv")
    val ham = (0 to 3).map(i =>
      bit_count(col(s"a.w$i").bitwiseXOR(col(s"b.w$i")))).reduce(_ + _)
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        ham.cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Video near-dup pairing over MULTI-FRAME signatures (r15 — the video
    * leg of the dedup family, composing the image dHash kernel with the
    * AVI frame walk): input is one row per (doc_id, frame_ix) with that
    * frame's 64-bit dHash as u32 halves (lo, hi); a video's signature is
    * the frame-hash tuple, its distance to another video the SUM of
    * per-frame Hamming distances over aligned frame indexes (the
    * temporal signature — re-encoded/lightly-edited duplicates keep
    * frame alignment; videos must carry the same fixed frame-sample
    * count k).
    *
    * Bands are WHOLE FRAME HASHES, not 16-bit blocks: a pair within total
    * Hamming H has its differing bits spread over at most H frames, so
    * with H < k at least one aligned frame matches EXACTLY — candidates
    * = videos sharing an identical (frame_ix, 64-bit hash), pigeonhole-
    * exact for H ≤ k−1 (k=4 frames covers the ≤3 threshold). The 64-bit
    * band key is the load-bearing scale choice: the first cut banded on
    * 16-bit blocks like [[hamming64Pairs]], and at 320 K videos the
    * 65 536-value band space birthday-collided into Θ(n²/2¹⁶) spurious
    * candidates — the x16→x64 ladder rung read 15× on 4× data, GC-bound
    * on candidate churn. Full-hash equality across unrelated videos is
    * ~2⁻⁶⁴ per aligned pair, so candidates ∝ true near-dup density at
    * any corpus size (measured post-fix: x16→x64 back to ~4× on 4×).
    * Exact verify joins candidates back to the k-row signatures per side
    * and sums `bit_count(xor)` — candidate-proportional, never corpus².
    * Only shuffles: the candidate join keyed on (frame_ix, lo, hi) and
    * the (da, db)-keyed verify agg. Output: (da, db, hamming). */
  def hammingFramePairs(sigs: DataFrame, maxHamming: Int = 3,
      frames: Int = 4): DataFrame = {
    require(maxHamming < frames,
      "frame-hash banding is exact only for Hamming < frame count")
    // one materialization: the upstream chain (container split + per-frame
    // decode + hash) is the expensive part and is read three times below
    val mat = sigs.localCheckpoint()
    val cands = mat.as("a")
      .join(mat.as("b"),
        col("a.frame_ix") === col("b.frame_ix") &&
          col("a.lo") === col("b.lo") && col("a.hi") === col("b.hi") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    cands
      .join(mat.as("x"), col("da") === col("x.doc_id"))
      .join(mat.as("y"), col("db") === col("y.doc_id") &&
        col("x.frame_ix") === col("y.frame_ix"))
      .groupBy(col("da"), col("db"))
      .agg(sum(bit_count(col("x.lo").bitwiseXOR(col("y.lo"))) +
        bit_count(col("x.hi").bitwiseXOR(col("y.hi")))).cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Connected components over duplicate pairs → canonical representative
    * per cluster (the dedup canonicalization step: every member maps to the
    * minimum doc_id of its component).
    *
    * Iterative min-label propagation: each round joins labels across edges
    * and keeps the elementwise min; converges in O(component diameter)
    * rounds (near-dup clusters are shallow — pairs/chains of a few docs).
    * Each round is one shuffle join; the driver only checks a scalar
    * convergence count, so this scales to billions of edges the same way
    * large-graph CC does. Output: (doc_id, cluster) for every doc that
    * appears in at least one pair. */
  /** Edge count up to which connected components run as driver-side
    * union-find instead of the iterative join loop. Dup-pair edge sets are
    * tiny relative to the corpus (they ARE the duplicates); collecting up
    * to this many 16-byte edges is the same class of driver load as a
    * broadcast build side, and replaces O(diameter) Spark jobs with one. */
  val SmallGraphMaxEdges: Long = 4L * 1000 * 1000

  def dupClusters(pairs: DataFrame, maxRounds: Int = 50,
      smallGraphMaxEdges: Long = SmallGraphMaxEdges): DataFrame = {
    // Materialize the (possibly expensive) pair computation ONCE before the
    // symmetric union reads it twice; localCheckpoint (not cache) because
    // iterative plans grow exponentially in lineage — checkpointing
    // truncates the logical plan each round.
    val spark = pairs.sparkSession
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    // normalize integral id types to long so both paths emit one schema;
    // non-integral ids (strings, etc.) skip the typed fast path below
    val sel = pairs.select(col("da"), col("db"))
    val integral = sel.schema.forall(f =>
      Seq(ByteType, ShortType, IntegerType, LongType).contains(f.dataType))
    val normalized =
      if (integral) sel.select(col("da").cast("long").as("da"), col("db").cast("long").as("db"))
      else sel
    val p0 = normalized.localCheckpoint()
    val nEdges = p0.count()
    if (integral && nEdges <= smallGraphMaxEdges) {
      // Small-graph fast path: exact union-find on the driver, one job in,
      // one tiny frame out. At 100 TB the pair set only exceeds this when
      // the corpus is pathologically duplicated — then the loop below runs.
      import spark.implicits._
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
        r
      }
      p0.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-label wins
      }
      val labels = parent.keys.toSeq.map(n => n -> find(n)).toMap
      val nodes = (labels.keySet ++ labels.values).toSeq.sorted
        .map(n => (n, labels.getOrElse(n, n)))
      return spark.createDataset(nodes).toDF("doc_id", "cluster")
    }
    val edges = p0.select(col("da").as("a"), col("db").as("b"))
      .union(p0.select(col("db").as("a"), col("da").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("a").as("node"), col("a").as("lbl"))
      .union(edges.select(col("b").as("node"), col("b").as("lbl")))
      .groupBy("node").agg(min("lbl").as("lbl"))
      .localCheckpoint()
    var converged = false
    var rounds = 0
    var prevSum = Option.empty[java.math.BigDecimal]
    while (!converged && rounds < maxRounds) {
      val viaEdges = edges.join(labels, edges("b") === labels("node"))
        .select(col("a").as("node"), col("lbl"))
      val prev = labels
      val next = prev.select(col("node"), col("lbl")).union(viaEdges)
        .groupBy("node").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      if (integral) {
        // Convergence via Σ labels: min-label propagation is monotonically
        // non-increasing per node, so an unchanged sum ⟺ no label changed —
        // one cheap aggregation per round instead of a self-join + count.
        // Summed as decimal(38,0): a long sum overflows (ANSI: throws) once
        // node count × id magnitude nears 2^63, which real corpora reach.
        val s = next.agg(sum(col("lbl").cast("decimal(38,0)")))
          .collect()(0).getDecimal(0)
        // sum over an EMPTY label frame is SQL null — an empty pair set is
        // a realistic call (no near-dups found) and nothing can change on
        // it, so null ⟹ converged; Objects.equals instead of compareTo so
        // a stored null never NPEs (ADVICE r17)
        converged = s == null || prevSum.exists(java.util.Objects.equals(_, s))
        prevSum = Some(s)
      } else {
        // Non-integral ids (strings, ...): Σ over the labels themselves
        // isn't defined, so sum a 64-bit HASH of each label — ONE cheap
        // aggregation per round, the same cost shape the integral path
        // enjoys, replacing the full label-compare join + isEmpty probe
        // this branch used to pay every round (VERDICT r16 #8). An
        // unchanged xxhash64 sum is treated as converged and then
        // CONFIRMED ONCE by the exact join below — a cancellation
        // collision (changed labels whose hash deltas net to zero) is
        // ~2⁻⁶⁴ per round, and the one-time exact check turns even that
        // into a continued loop instead of a silent wrong answer. Total
        // join cost: one per RUN, not one per round.
        val s = next.agg(sum(xxhash64(col("lbl")).cast("decimal(38,0)")))
          .collect()(0).getDecimal(0)
        // null ⟸ empty frame (see integral branch): converged-eligible,
        // not an NPE at compareTo (ADVICE r17) — the exact confirm below
        // is trivially empty-true on empty frames
        val sumUnchanged = s == null || prevSum.exists(java.util.Objects.equals(_, s))
        prevSum = Some(s)
        converged = sumUnchanged && next.as("n")
          .join(prev.withColumnRenamed("lbl", "prev_lbl"), "node")
          .where(col("lbl") =!= col("prev_lbl"))
          .isEmpty
      }
      labels = next
      rounds += 1
    }
    // Returning unconverged labels would be silently WRONG for components
    // of diameter > maxRounds — refuse instead (callers with deeper graphs
    // raise maxRounds; near-dup clusters are shallow in practice).
    if (!converged)
      throw new IllegalStateException(
        s"dupClusters: min-label propagation did not converge in $maxRounds rounds " +
          "(component diameter exceeds the cap); raise maxRounds")
    labels.select(col("node").as("doc_id"), col("lbl").as("cluster"))
  }

  /** Embedding near-dup pairs: EXACT cosine ≥ tau via a block-tiled
    * all-pairs equi-join (no BroadcastNestedLoopJoin anywhere in the plan).
    *
    * Exact low-threshold all-pairs is inherently Θ(n²) WORK on data without
    * similarity structure (the harness embeddings are continuous through
    * any threshold — there is no gap a sub-quadratic sketch could exploit
    * with recall 1). What a cluster buys is distributing that work: each
    * vector is assigned a block `b = vec_id mod B`; side A replicates a
    * block-p vector to tiles (p, q≥p), side B to tiles (p≤q, q), and an
    * ordinary shuffle join on the tile key lands every unordered pair in
    * exactly one of the B(B+1)/2 evenly-sized tiles. Shuffle volume is
    * O(n·B) vectors; per-task work (n/B)² — tune B to the cluster.
    *
    * When approximate recall suffices, [[Similarity.lshCosinePairs]] is the
    * sub-quadratic path. */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double, blocks: Int = 8): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      pmod(col(idCol), lit(blocks)).cast("int").as("blk"))
    val sideA = e.select(col("vec_id"), col("v"), col("blk").as("p"),
        explode(sequence(col("blk"), lit(blocks - 1))).as("q"))
    val sideB = e.select(col("vec_id"), col("v"),
        explode(sequence(lit(0), col("blk"))).as("p"), col("blk").as("q"))
    sideA.as("a")
      .join(sideB.as("b"),
        col("a.p") === col("b.p") && col("a.q") === col("b.q") &&
          (col("a.p") < col("a.q") || col("a.vec_id") < col("b.vec_id")))
      .select(
        least(col("a.vec_id"), col("b.vec_id")).as("va"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("vb"),
        // cosineF is orientation-symmetric bit-for-bit (same per-i products,
        // commutative final multiply), so least/greatest relabeling is safe
        cosineSim(col("a.v"), col("b.v")).as("cos"))
      .where(col("cos") >= tau)
  }
}
