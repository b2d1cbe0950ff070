package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import graft.operators.{TextAnalysis => TA}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators as registered queries
  * (SURVEY.md §7.2 step 4): dedup (exact / n-gram Jaccard / MinHash+LSH /
  * SimHash / embedding-cosine), similarity search (brute / IVF / LSH),
  * text analysis (lang-id / quality / tokens / fingerprints), multimodal
  * plumbing. */
object PipelineQueries {

  /** DuckDB manual double-precision cosine — same accumulation order as
    * TextHashes.cosineF, so values are bit-identical. */
  private[operators] def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * $b[i]))
       | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE)*x)))
       |    * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE)*x)))))""".stripMargin

  /** The q_nfc_versions probe corpus: (probe_id, codepoint sequence) —
    * combining-mark shapes exercising distinct UAX #15 behaviors (see the
    * registry row's comment). Both engines build the SAME raw strings from
    * these codepoints; BMP-only so Spark's and DuckDB's length() count
    * identically. */
  private val nfcProbe: Seq[(Long, Seq[Int])] = Seq(
    1L -> Seq('e'.toInt, 0x0301),          // 1.1-era composition → é
    2L -> Seq('e'.toInt, 0x0323, 0x0301),  // ccc 220/230 reorder + compose
    3L -> Seq(0x0915, 0x093C),             // composition EXCLUSION (→ not U+0958)
    4L -> Seq(0x212B),                     // singleton: Angstrom → Å
    5L -> Seq(0x1100, 0x1161, 0x11A8),     // Hangul jamo → algorithmic syllable
    6L -> Seq('A'.toInt, 0x030A),          // A + ring → Å (same target as 4)
    7L -> Seq(0x03B1, 0x0345, 0x0301),     // Greek ypogegrammeni ordering
    8L -> Seq('a'.toInt, 0x1DF8, 0x0301),  // Unicode-10 mark + ccc ordering
    9L -> Seq(0x017F, 0x0307),             // long s + dot: excluded from composition
    10L -> Seq('x'.toInt, 0x0344))         // the MARK decomposes (→ 0308 0301)

  /** The same corpus as DuckDB VALUES rows built from chr() codepoints. */
  private def nfcProbeSqlValues: String =
    nfcProbe.map { case (id, cps) =>
      s"($id, ${cps.map(c => s"chr($c)").mkString(" || ")})"
    }.mkString(", ")

  /** Shared oracle CTE stack replaying [[Similarity.knnGraph]] (k = 5,
    * 8 tables, adaptive width): md5-derived hyperplanes, sign buckets,
    * candidate collisions, exact cosine per undirected pair, both directed
    * orientations, per-source rank. Non-recursive — composable under a
    * `WITH RECURSIVE` header (q_knn_clusters appends a transitive
    * closure). Final relation: `rk(src, dst, cos, rank)`. */
  private def knnCtes: String =
    s"""bw AS (
       |  SELECT greatest(8, least(28,
       |    length(bin(greatest(count(*), 2) - 1)) + 1)) AS bits
       |  FROM embeddings),
       |planes AS (
       |  SELECT t.t, j.j, i.i,
       |    CASE WHEN (('0x' || substr(md5(t.t::VARCHAR || '_' || j.j::VARCHAR || '_' || i.i::VARCHAR), 1, 1))::BIGINT & 1) = 1
       |         THEN 1.0 ELSE -1.0 END AS s
       |  FROM (SELECT unnest(range(0, 8)) AS t) t
       |  CROSS JOIN (SELECT unnest(range(0, (SELECT bits FROM bw))) AS j) j
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i),
       |dots AS (
       |  SELECT e.vec_id, p.t, p.j, sum(p.s * e.embedding[p.i + 1]) AS dot
       |  FROM embeddings e CROSS JOIN planes p
       |  GROUP BY 1, 2, 3),
       |buckets AS (
       |  SELECT vec_id, t,
       |    sum(CASE WHEN dot > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
       |  FROM dots GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
       |  FROM buckets a JOIN buckets b
       |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT c.va, c.vb, ${cosSql("ea.embedding", "eb.embedding")} AS cos
       |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.va
       |              JOIN embeddings eb ON eb.vec_id = c.vb),
       |ksym AS (
       |  SELECT va AS src, vb AS dst, cos FROM scored
       |  UNION ALL
       |  SELECT vb AS src, va AS dst, cos FROM scored),
       |rk AS (
       |  SELECT src, dst, cos,
       |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rank
       |  FROM ksym)""".stripMargin

  /** doc_ids spread across every core BEFORE a synthetic payload is
    * attached. The harness documents table is one small parquet file =
    * ONE input partition, so a payload synthesized in the same projection
    * as its decode kernel would run single-threaded (measured: the whole
    * 10.4 s of q_mm_dedup_image at sf0.1 was one task). Exchanging bare
    * doc_ids costs 8 B/row; exchanging synthesized payloads would cost
    * the corpus — and Catalyst never moves a deterministic projection
    * below a user repartition, so synthesis provably runs post-exchange.
    * (At 100 TB real images arrive pre-partitioned from storage and this
    * exchange disappears; it is harness-shape realism, not a scale cost.) */
  private def spreadDocIds(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism)

  /** Per-frame dHash signatures of the synthetic video corpus —
    * (doc_id, frame_ix, lo, hi); shared by q_mm_dedup_video and its
    * canonicalization composition. */
  private def videoSigs(s: SparkSession, d: String): DataFrame = {
    import graft.functions.{GraftFunctions => GFF}
    GFF.register(s)
    spreadDocIds(s, d)
      .select(col("doc_id"), GFF.synthAviGroup(col("doc_id")).as("payload"))
      .select(col("doc_id"), posexplode(GFF.aviFrames(col("payload"))))
      .select(col("doc_id"), col("pos").as("frame_ix"),
        GFF.dhash(col("col")).as("fh"))
      .where(size(col("fh")) === 2)
      .select(col("doc_id"), col("frame_ix"),
        element_at(col("fh"), 1).as("lo"), element_at(col("fh"), 2).as("hi"))
  }

  /** DuckDB replay of the video per-frame dHash chain up to
    * `hashes(doc_id, f, lo, hi)` — shared by q_mm_dedup_video and its
    * canonicalization composition. */
  private def videoHashesSql: String =
    """raw AS (
      |  SELECT doc_id, f.f AS f, x.x AS x, y.y AS y,
      |    ((xor(xor(xor((doc_id // 3) * 73856093, x.x * 19349663),
      |              y.y * 83492791), f.f * 15485863) % 2147483648)
      |     * 2654435761 >> 21) % 256 AS base
      |  FROM documents,
      |       (SELECT unnest(range(0, 4)) AS f) f,
      |       (SELECT unnest(range(0, 36)) AS x) x,
      |       (SELECT unnest(range(0, 32)) AS y) y),
      |px AS (
      |  SELECT doc_id, f, x, y,
      |    CASE WHEN doc_id % 3 > 0 AND f = doc_id % 3
      |              AND x // 4 = doc_id % 3 AND y // 4 = doc_id % 3
      |         THEN (base + 8) % 256 ELSE base END AS lum
      |  FROM raw),
      |cells AS (
      |  SELECT doc_id, f, x // 4 AS cx, y // 4 AS cy, 3 * sum(lum) AS s
      |  FROM px GROUP BY 1, 2, 3, 4),
      |bits AS (
      |  SELECT a.doc_id, a.f, a.cy, a.cx,
      |         CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
      |  FROM cells a JOIN cells b
      |    ON a.doc_id = b.doc_id AND a.f = b.f
      |       AND a.cy = b.cy AND b.cx = a.cx + 1
      |  WHERE a.cx < 8),
      |hashes AS (
      |  SELECT doc_id, f,
      |    sum(CASE WHEN cy < 4 THEN bit::BIGINT << (cy * 8 + cx)::INT ELSE 0 END) AS lo,
      |    sum(CASE WHEN cy >= 4 THEN bit::BIGINT << ((cy - 4) * 8 + cx)::INT ELSE 0 END) AS hi
      |  FROM bits GROUP BY 1, 2)""".stripMargin

  /** Embedding dimensionality (pinned by the harness embeddings table). */
  private val PcaDim = 64

  /** ONE distributed pass: the CovAggregator buffer
    * [n, s_0..s_{d-1}, upper-triangle s_ij] — 2145 exact longs. */
  private def pcaCovBuffer(s: SparkSession, d: String): Seq[Long] = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * lit(1048576.0) + lit(0.5))
          .cast("long")).as("v"))
      .as[Seq[Long]]
      .select(new graft.functions.CovAggregator(PcaDim).toColumn)
      .head()
  }

  /** Full symmetric covariance matrix from the aggregated buffer — every
    * entry the same IEEE double the DuckDB `covq` CTE produces. */
  private def pcaCovMatrix(s: SparkSession, dd: String): Array[Array[Double]] = {
    val dim = PcaDim
    val buf = pcaCovBuffer(s, dd)
    val n = buf(0)
    val c = Array.ofDim[Double](dim, dim)
    for { i <- 0 until dim; j <- i until dim } {
      val sij = buf(1 + dim + i * dim - i * (i - 1) / 2 + (j - i))
      val cov = (n.toDouble * sij.toDouble
        - buf(1 + i).toDouble * buf(1 + j).toDouble) /
        (n.toDouble * n.toDouble * 1048576.0 * 1048576.0)
      c(i)(j) = cov; c(j)(i) = cov
    }
    c
  }

  /** 24 power-iteration steps from v₀ = 1/8·𝟙, every float op
    * IEEE-identical to the DuckDB recursive-CTE replay (same fold
    * order). Returns (unit eigenvector RAW doubles, lambda = ||C v||). */
  private def powerIterate(c: Array[Array[Double]]): (Array[Double], Double) = {
    val dim = c.length
    def matVec(v: Array[Double]): Array[Double] = {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc = acc + c(i)(j) * v(j); j += 1 }
        w(i) = acc; i += 1
      }
      w
    }
    def norm(w: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < dim) { acc = acc + w(i) * w(i); i += 1 }
      math.sqrt(acc)
    }
    var v = Array.fill(dim)(0.125)
    for (_ <- 0 until 24) {
      val w = matVec(v)
      val nrm = norm(w)
      v = w.map(_ / nrm)
    }
    (v, norm(matVec(v)))
  }

  /** Driver-side top principal component (see [[powerIterate]]). */
  private def pcaTopComponent(s: SparkSession, dd: String): (Array[Double], Double) =
    powerIterate(pcaCovMatrix(s, dd))

  /** Second-stage power iteration with per-step Gram-Schmidt against v1
    * (deflation alone is contaminated by v1's own convergence residual —
    * measured v1·v2 ≈ 0.037 without the projection). Same IEEE-order
    * discipline as [[powerIterate]]; the DuckDB twin replays dot,
    * projection and normalization in the same fold order. */
  private def powerIterateOrtho(c: Array[Array[Double]],
      v1: Array[Double]): (Array[Double], Double) = {
    val dim = c.length
    def matVec(v: Array[Double]): Array[Double] = {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc = acc + c(i)(j) * v(j); j += 1 }
        w(i) = acc; i += 1
      }
      w
    }
    def norm(w: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < dim) { acc = acc + w(i) * w(i); i += 1 }
      math.sqrt(acc)
    }
    var v = Array.fill(dim)(0.125)
    for (_ <- 0 until 24) {
      val w = matVec(v)
      var d = 0.0
      var k = 0
      while (k < dim) { d = d + v1(k) * w(k); k += 1 }
      val p = new Array[Double](dim)
      var i = 0
      while (i < dim) { p(i) = w(i) - d * v1(i); i += 1 }
      val nrm = norm(p)
      v = p.map(_ / nrm)
    }
    (v, norm(matVec(v)))
  }

  /** DuckDB CTE chain ending in `covq` = (i, j, n, s_i, s_j, s_ij, cov):
    * the exact integer-quantized covariance of the embedding table —
    * shared by q_pca_cov (which SELECTs it) and q_pca_power (which
    * iterates on it). The quantization ⌊x·2^20 + 0.5⌋ is exact (power-of-
    * two scale), sums are int64, and the final cov double mirrors the
    * Scala expression tree token-for-token. */
  private def pcaCovSql: String =
    """q AS (SELECT list_transform(embedding,
      |    x -> floor(x::DOUBLE * 1048576.0 + 0.5)::BIGINT) AS v
      |  FROM embeddings),
      |nn AS (SELECT count(*)::BIGINT AS n FROM q),
      |e AS (SELECT v, unnest(range(0, 64)) AS i FROM q),
      |s AS (SELECT i, sum(v[i + 1])::BIGINT AS s FROM e GROUP BY i),
      |p AS (SELECT i, j, sum(v[i + 1] * v[j + 1])::BIGINT AS s_ij
      |  FROM e CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
      |  WHERE j >= i GROUP BY i, j),
      |covq AS (SELECT p.i::INTEGER AS i, p.j::INTEGER AS j, nn.n,
      |  a.s AS s_i, b.s AS s_j, p.s_ij,
      |  (nn.n::DOUBLE * p.s_ij::DOUBLE - a.s::DOUBLE * b.s::DOUBLE)
      |    / (nn.n::DOUBLE * nn.n::DOUBLE * 1048576.0 * 1048576.0) AS cov
      |FROM p JOIN s a ON a.i = p.i JOIN s b ON b.i = p.j CROSS JOIN nn)""".stripMargin

  /** DuckDB power-iteration chain over the full matrix CTE `$mat`
    * (rows (i, j, cov)): generates crow$x/cl$x/it$x/fin$x — `fin$x` is
    * one row holding the raw eigenvector after 24 steps. Suffixing lets
    * q_pca_top2 run the identical chain twice (raw C, then the deflated
    * C − λ₁v₁v₁ᵀ). */
  private def pcaPowerChainSql(x: String, mat: String): String =
    s"""crow$x AS (SELECT i, list(cov ORDER BY j) AS c FROM $mat GROUP BY i),
      |cl$x AS (SELECT list(c ORDER BY i) AS cc FROM crow$x),
      |it$x(t, v) AS (
      |  SELECT 0, (SELECT list(0.125::DOUBLE ORDER BY x) FROM
      |             (SELECT unnest(range(0, 64)) AS x))
      |  UNION ALL
      |  SELECT it$x.t + 1,
      |    list_transform([
      |      list_transform(range(1, 65), i2 ->
      |        list_reduce(list_prepend(0.0,
      |          list_transform(range(1, 65), k -> cl$x.cc[i2][k] * it$x.v[k])),
      |          (a, b) -> a + b))],
      |      w -> list_transform(w, y -> y / sqrt(
      |        list_reduce(list_prepend(0.0,
      |          list_transform(w, y2 -> y2 * y2)), (a, b) -> a + b))))[1]
      |  FROM it$x CROSS JOIN cl$x WHERE it$x.t < 24),
      |fin$x AS (SELECT v FROM it$x WHERE t = 24)""".stripMargin

  /** The unsuffixed chain over the symmetric expansion of `covq` —
    * shared by q_pca_power and q_pca_project. */
  private def pcaPowerSql: String =
    s"""cm AS (SELECT i, j, cov FROM covq
      |       UNION ALL SELECT j, i, cov FROM covq WHERE i <> j),
      |${pcaPowerChainSql("", "cm")}""".stripMargin

  /** DuckDB replay of the dHash signature chain (synthPatternPng pixels
    * -> 4x4 cell sums -> 64 comparison bits -> (lo, hi) u32 halves) up to
    * a `hashes(doc_id, lo, hi)` CTE — shared by the image near-dup pair
    * query and its canonicalization composition. */
  /** The synth-corpus pixel replay (raw spatial-hash byte + the variant
    * cell edit) — shared by the 64-bit and 128-bit dHash oracle chains. */
  private def dhashPxSql: String =
    """raw AS (
      |  SELECT doc_id, x.x AS x, y.y AS y,
      |    ((xor(xor((doc_id // 3) * 73856093, x.x * 19349663),
      |          y.y * 83492791) % 2147483648)
      |     * 2654435761 >> 21) % 256 AS base
      |  FROM documents,
      |       (SELECT unnest(range(0, 36)) AS x) x,
      |       (SELECT unnest(range(0, 32)) AS y) y),
      |px AS (
      |  SELECT doc_id, x, y,
      |    CASE WHEN doc_id % 3 > 0 AND x // 4 = doc_id % 3
      |              AND y // 4 = doc_id % 3
      |         THEN (base + 8) % 256 ELSE base END AS lum
      |  FROM raw)""".stripMargin

  private def dhashHashesSql: String =
    s"""$dhashPxSql,
      |cells AS (
      |  SELECT doc_id, x // 4 AS cx, y // 4 AS cy, 3 * sum(lum) AS s
      |  FROM px GROUP BY 1, 2, 3),
      |bits AS (
      |  SELECT a.doc_id, a.cy, a.cx,
      |         CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
      |  FROM cells a JOIN cells b
      |    ON a.doc_id = b.doc_id AND a.cy = b.cy AND b.cx = a.cx + 1
      |  WHERE a.cx < 8),
      |hashes AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN cy < 4 THEN bit::BIGINT << (cy * 8 + cx)::INT ELSE 0 END) AS lo,
      |    sum(CASE WHEN cy >= 4 THEN bit::BIGINT << ((cy - 4) * 8 + cx)::INT ELSE 0 END) AS hi
      |  FROM bits GROUP BY 1)""".stripMargin

  /** Shared exact-Jaccard oracle (k=3 word shingles, tau): the oracle for
    * BOTH the inverted-index exact query and the MinHash+LSH query — LSH
    * recall at the planted-duplicate similarity level (J ≥ 0.9) is
    * 1-(1-0.9⁴)³² ≈ 1-3e-15, so the verified LSH output equals the exact
    * answer. */
  private def jaccardSql(tau: Double): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-2, 0)+1),
       |           i -> array_to_string(t[i:i+2], ' '))) AS s FROM toks)),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT p.da, p.db, CAST(p.inter AS DOUBLE)/(ca.n + cb.n - p.inter) AS jac
       |FROM pairs p JOIN cnt ca ON p.da = ca.doc_id JOIN cnt cb ON p.db = cb.doc_id
       |WHERE CAST(p.inter AS DOUBLE)/(ca.n + cb.n - p.inter) >= $tau
       |ORDER BY da, db""".stripMargin

  private val tokSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** DuckDB replay of KMeansQuant.fit(k=8, iters=2, scale=1000) over the
    * embeddings table: CTE chain ending in `a2` = the final assignment
    * `(vec_id, v, cid, dist)`. Shared by q_ann_kmeans / q_ann_ivf_kmeans. */
  private val kmeansCtes: String = {
    def step(n: Int, cents: String) =
      s"""d$n AS (
         |  SELECT q.vec_id, q.v, c.cid,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i]))) AS BIGINT) AS dist
         |  FROM q CROSS JOIN $cents c),
         |a$n AS (
         |  SELECT vec_id, v, cid, dist FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d$n)
         |  WHERE rn = 1)""".stripMargin
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
       |  FROM embeddings),
       |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, v AS cv FROM q WHERE vec_id < 8),
       |${step(1, "c0")},
       |u1 AS (
       |  SELECT cid, i.i,
       |    CAST(round(CAST(sum(v[i.i]) AS DOUBLE) / count(*)) AS BIGINT) AS c
       |  FROM a1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
       |  GROUP BY 1, 2),
       |c1 AS (SELECT cid, list(c ORDER BY i) AS cv FROM u1 GROUP BY 1),
       |${step(2, "c1")}""".stripMargin
  }
  /** Shared oracle for both cluster-canonicalization rows (driver
    * union-find and forced-distributed min-label propagation): recursive
    * transitive closure over the exact verified pairs, label = min member. */
  private def clustersOracleSql: String =
    s"""WITH RECURSIVE pairs AS (${jaccardSql(0.8).replace("ORDER BY da, db", "")}),
       |sym AS (SELECT da AS a, db AS b FROM pairs
       |        UNION SELECT db AS a, da AS b FROM pairs),
       |reach AS (
       |  SELECT a AS src, b AS dst FROM sym
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
       |)
       |SELECT src AS doc_id, least(src, min(dst)) AS cluster
       |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin

  private def hitsSql(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"

  /** Near-dup machinery shared across the dedup queries, one computation
    * per (session, dir) — like one open per file in the reference:
    *
    *   - the expensive tokenize→shingle→sign scan ([[Dedup.shingleSigSets]])
    *     runs once and feeds BOTH the MinHash and the exact-PPJoin pipeline;
    *   - each (tiny) verified pair set is checkpointed for reuse;
    *   - q_dedup_clusters / q_dedup_best consume the EXACT pair set, the
    *     same one their recursive-CTE oracles close over (LSH recall at
    *     this tau is ~1 but probabilistic — the oracle-checked cluster
    *     queries must not depend on it, ADVICE r2).
    *
    * Session-scoped caches evict when the owning session ends. */
  private val setsCache = new graft.core.SessionCache[org.apache.spark.sql.DataFrame]
  private val pairsCache = new graft.core.SessionCache[org.apache.spark.sql.DataFrame]
  private def sets3(s: org.apache.spark.sql.SparkSession, d: String) =
    setsCache.getOrElseUpdate(s, d)(
      Dedup.shingleSigSets(Tables.documents(s, d), "doc_id", "text", 3))
  private def minhashPairs08(s: org.apache.spark.sql.SparkSession, d: String) =
    pairsCache.getOrElseUpdate(s, s"mh:$d")(
      Dedup.minhashPairsFrom(sets3(s, d), 0.8).localCheckpoint())
  private def exactPairs08(s: org.apache.spark.sql.SparkSession, d: String) =
    pairsCache.getOrElseUpdate(s, s"ng:$d")(
      Dedup.ngramJaccardPairsFrom(sets3(s, d), 0.8).localCheckpoint())
  /** One k-means fit per (session, dir): q_ann_kmeans and q_ann_ivf_kmeans
    * consume the same assignment (tiny: vec_id, v, cid, dist). */
  private def kmeansFit(s: org.apache.spark.sql.SparkSession, d: String) =
    pairsCache.getOrElseUpdate(s, s"km:$d")(
      KMeansQuant.fit(Tables.embeddings(s, d), "vec_id", "embedding", 8, 2)
        .localCheckpoint())
  /** The codebook the cached fit assigned against (deterministic re-derive,
    * see KMeansQuant.centroidsAfter) — the probe targets for multi-probe. */
  private def kmeansCents(s: org.apache.spark.sql.SparkSession, d: String) =
    pairsCache.getOrElseUpdate(s, s"kmc:$d")(
      KMeansQuant.centroidsAfter(Tables.embeddings(s, d), "vec_id", "embedding", 8, 2)
        .localCheckpoint())
  /** Product-quantization subspace i (64 dims → 4 × 16): the sliced
    * sub-vectors, their deterministic k-means fit (= PQ codes), and the
    * per-subspace codebook — each cached once per (session, dir). */
  private def pqSub(s: org.apache.spark.sql.SparkSession, d: String, i: Int) =
    Tables.embeddings(s, d)
      .select(col("vec_id"), slice(col("embedding"), i * 16 + 1, 16).as("sub"))
  private def pqFit(s: org.apache.spark.sql.SparkSession, d: String, i: Int) =
    pairsCache.getOrElseUpdate(s, s"pqf$i:$d")(
      KMeansQuant.fit(pqSub(s, d, i), "vec_id", "sub", 8, 2).localCheckpoint())
  private def pqCents(s: org.apache.spark.sql.SparkSession, d: String, i: Int) =
    pairsCache.getOrElseUpdate(s, s"pqc$i:$d")(
      KMeansQuant.centroidsAfter(pqSub(s, d, i), "vec_id", "sub", 8, 2)
        .localCheckpoint())

  /** DuckDB replay of the 4 per-subspace k-means fits (k=8, iters=2,
    * scale=1000) over 16-dim slices — suffix _sN per subspace; mirrors
    * [[kmeansCtes]]. Final tables per subspace: a2_sN (codes) and c1_sN
    * (codebook). */
  private val pqCtes: String = {
    def one(i: Int): String = {
      val off = i * 16
      def step(n: Int, cents: String) =
        s"""d${n}_s$i AS (
           |  SELECT q.vec_id, q.v, c.cid,
           |    CAST(list_sum(list_transform(range(1, 17),
           |      j -> (q.v[j] - c.cv[j]) * (q.v[j] - c.cv[j]))) AS BIGINT) AS dist
           |  FROM q_s$i q CROSS JOIN $cents c),
           |a${n}_s$i AS (
           |  SELECT vec_id, v, cid, dist FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |    FROM d${n}_s$i)
           |  WHERE rn = 1)""".stripMargin
      s"""q_s$i AS (
         |  SELECT vec_id, list_transform(range(${off + 1}, ${off + 17}),
         |    j -> CAST(round(CAST(embedding[j] AS DOUBLE) * 1000) AS BIGINT)) AS v
         |  FROM embeddings),
         |c0_s$i AS (SELECT CAST(vec_id AS INTEGER) AS cid, v AS cv FROM q_s$i WHERE vec_id < 8),
         |${step(1, s"c0_s$i")},
         |u1_s$i AS (
         |  SELECT cid, j.j,
         |    CAST(round(CAST(sum(v[j.j]) AS DOUBLE) / count(*)) AS BIGINT) AS c
         |  FROM a1_s$i CROSS JOIN (SELECT unnest(range(1, 17)) AS j) j
         |  GROUP BY 1, 2),
         |c1_s$i AS (SELECT cid, list(c ORDER BY j) AS cv FROM u1_s$i GROUP BY 1),
         |${step(2, s"c1_s$i")}""".stripMargin
    }
    "WITH " + (0 until 4).map(one).mkString(",\n")
  }
  /** One tokenize pass per (session, dir): the exploded `(doc_id, term)`
    * stream feeds the vocab/tf-idf/LM-score/CMS queries — each would
    * otherwise re-run the regex tokenizer over the corpus (and q_lm_score
    * reads it twice within its own plan). */
  /** Documents with the CPU-heavy per-row text work spread across tasks:
    * the corpus arrives as one small parquet split locally (and as coarse
    * splits generally), which would serialize tokenizer/hash kernels on a
    * single task — one cheap shuffle of the raw text first. */
  private def docsSpread(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .repartition(s.sessionState.conf.numShufflePartitions)
  /** One bigram pass per (session, dir): the (doc_id, p, w) adjacent-pair
    * table feeds surprisal scoring AND model training. */
  private def bigrams(s: org.apache.spark.sql.SparkSession, d: String) =
    pairsCache.getOrElseUpdate(s, s"bg:$d") {
      docsSpread(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .where(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS p, t[i] AS w))")).as("b"))
        .select(col("doc_id"), col("b.p").as("p"), col("b.w").as("w"))
        .localCheckpoint()
    }
  private def tokStream(s: org.apache.spark.sql.SparkSession, d: String) =
    pairsCache.getOrElseUpdate(s, s"tok:$d")(
      docsSpread(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .localCheckpoint())
  /** One winnowing pass per (session, dir): the (doc_id, fp) fingerprint
    * table feeds both the per-doc query and the overlap-pair join. */
  private def winnowFps(s: org.apache.spark.sql.SparkSession, d: String) =
    pairsCache.getOrElseUpdate(s, s"wf:$d") {
      GraftFunctions.register(s)
      docsSpread(s, d)
        .select(col("doc_id"), explode(winnow60(tokens(col("text")), 4, 5)).as("fp"))
        .distinct()
        .localCheckpoint()
    }

  /** Planted-twin corpus shared by q_ann_lsh_recall and q_dedup_embed_lsh:
    * the harness embeddings plus, for each of the first 64 vectors, a twin
    * (id + 1e6) with md5-signed ±50% multiplicative per-dim perturbation —
    * pairs land at cos ≈ 0.89, where 12-bit × 8-table LSH recall is a
    * nontrivial ~0.7 (the harness embeddings are random; no natural
    * high-cos pairs exist). Replayable: signs come from md5 of the ORIGINAL
    * vec_id, so the oracle rebuilds the exact same floats. */
  private def plantedTwinCorpus(s: org.apache.spark.sql.SparkSession, d: String) = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    def sgn(i: org.apache.spark.sql.Column) =
      when(conv(substring(md5(concat(lit("plant_"), col("vec_id").cast("string"),
        lit("_"), i.cast("string"))), 1, 1), 16, 10).cast("long") % 2 === 1, lit(1.0))
        .otherwise(lit(-1.0))
    // two-step select: the sgn() md5 key must see the ORIGINAL vec_id —
    // aliasing `vec_id + 1000000 AS vec_id` in the same projection
    // would shadow the reference inside the lambda
    val planted = e.where(col("vec_id") < 64)
      .select(col("vec_id"),
        transform(sequence(lit(0), size(col("embedding")) - 1), i =>
          (element_at(col("embedding"), i + 1).cast("double") *
            (lit(1.0) + lit(0.5) * sgn(i))).cast("float")).as("embedding"))
      .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
    e.unionByName(planted)
  }

  /** DuckDB CTEs rebuilding [[plantedTwinCorpus]] as `u(vec_id, embedding)`. */
  private val plantedUnionCtes: String =
    """planted AS (
      |  SELECT vec_id + 1000000 AS vec_id,
      |    list_transform(range(1, len(embedding)+1), i ->
      |      CAST(CAST(embedding[i] AS DOUBLE) *
      |        (1.0 + 0.5 * (CASE WHEN (('0x' || substr(md5('plant_' || vec_id::VARCHAR || '_' || (i-1)::VARCHAR), 1, 1))::BIGINT & 1) = 1
      |                      THEN 1.0 ELSE -1.0 END)) AS REAL)) AS embedding
      |  FROM embeddings WHERE vec_id < 64),
      |u AS (SELECT vec_id, embedding FROM embeddings
      |      UNION ALL SELECT vec_id, embedding FROM planted)""".stripMargin

  /** DuckDB CTEs replaying `Similarity.lshCosinePairs(u, tau, bits, tables)`
    * — md5 ±1 planes, `bits`-bit sign buckets × `tables` tables,
    * bucket-collision candidates, exact cosine verify — ending in
    * `lsh(va, vb)`. Parameterized so the default (12×8) and the
    * high-recall (10×16) registrations replay the same construction. */
  private def lshPairCtes(tau: Double, bits: Int, tables: Int): String =
    lshPairCtesDials(tau, bits.toString, tables.toString)

  /** [[lshPairCtes]] with the two dials as SQL expressions, so the
    * recall-contract variant can derive them from subqueries while the
    * pinned registrations inline integer literals. */
  private def lshPairCtesDials(tau: Double, bits: String, tables: String): String =
    s"""planes AS (
       |  SELECT t.t, j.j, i.i,
       |    CASE WHEN (('0x' || substr(md5(t.t::VARCHAR || '_' || j.j::VARCHAR || '_' || i.i::VARCHAR), 1, 1))::BIGINT & 1) = 1
       |         THEN 1.0 ELSE -1.0 END AS s
       |  FROM (SELECT unnest(range(0, $tables)) AS t) t
       |  CROSS JOIN (SELECT unnest(range(0, $bits)) AS j) j
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i),
       |dots AS (
       |  SELECT e.vec_id, p.t, p.j, sum(p.s * e.embedding[p.i + 1]) AS dot
       |  FROM u e CROSS JOIN planes p
       |  GROUP BY 1, 2, 3),
       |buckets AS (
       |  SELECT vec_id, t,
       |    sum(CASE WHEN dot > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
       |  FROM dots GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
       |  FROM buckets a JOIN buckets b
       |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |lsh AS (
       |  SELECT va, vb FROM (
       |    SELECT c.va, c.vb, ${cosSql("ea.embedding", "eb.embedding")} AS cos
       |    FROM cand c JOIN u ea ON ea.vec_id = c.va
       |                JOIN u eb ON eb.vec_id = c.vb)
       |  WHERE cos >= $tau)""".stripMargin
  private val lshPairCtes08: String = lshPairCtes(0.8, 12, 8)

  /** DuckDB CTEs replaying `Similarity.lshCosinePairsRecall(u, tau,
    * targetRecall, designCos)` — BOTH dials derived from the corpus the
    * query actually hashes (the planted union `u`, so count = n + 64):
    * bits = adaptiveBits(count(u)) via integer bit-length, tables =
    * tablesForRecall(bits) via the acos/ln/power model (the Scala side
    * asserts the ceil argument is ≥1e-6 from an integer boundary, so a
    * 1-ulp libm divergence can't flip the count silently). Same dial
    * arithmetic as q_ann_lsh_target's oracle, re-based onto `u`. */
  private def lshPairCtesRecall(tau: Double, targetRecall: Double, designCos: Double): String =
    s"""bw AS (
       |  SELECT greatest(8, least(28,
       |    length(bin(greatest(count(*), 2) - 1)) + 1)) AS bits
       |  FROM u),
       |pr AS (
       |  SELECT least(128, greatest(1,
       |    ceil(ln(1.0 - $targetRecall) /
       |         ln(1.0 - power(1.0 - acos(least($designCos, 1.0)) / pi(), bits)))::INT)) AS tables
       |  FROM bw),
       |${lshPairCtesDials(tau, "(SELECT bits FROM bw)", "(SELECT tables FROM pr)")}""".stripMargin

  val all: Map[String, Q] = Map(

    // ---- deduplication ----
    "q_dedup_exact" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d).withColumn("h", md5(col("text").cast("binary")))
        Dedup.exact(docs, "doc_id", Seq("h")).orderBy("h")
      },
      "SELECT md5(text) AS h, min(doc_id) AS doc_id FROM documents GROUP BY 1 ORDER BY h"),

    "q_dedup_keyed" -> Q(
      (s, d) => Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
        .orderBy("lang", "source"),
      """SELECT lang, source, min(doc_id) AS doc_id, count(*) AS n_dups
        |FROM documents GROUP BY 1, 2 ORDER BY lang, source""".stripMargin),

    "q_dedup_ngram" -> Q(
      (s, d) => exactPairs08(s, d).orderBy("da", "db"),
      jaccardSql(0.8)),

    "q_dedup_minhash" -> Q(
      (s, d) => minhashPairs08(s, d).orderBy("da", "db"),
      jaccardSql(0.8)),

    // directed CONTAINMENT dedup (r15): |A∩B|/|A| >= 0.9 — the asymmetric
    // complement of Jaccard that catches quote-inclusion (small doc inside
    // big one: containment ~1, Jaccard ~|A|/|B| -> q_dedup_ngram misses
    // it by construction). Contained side indexes its rarest-first prefix,
    // container side indexes ALL postings (no size bound exists on B);
    // exact verification makes recall/precision exact — checked by the
    // all-pairs oracle. Shares the session's one tokenize->shingle scan.
    "q_dedup_containment" -> Q(
      (s, d) => Dedup.containmentPairsFrom(sets3(s, d), 0.9)
        .orderBy("da", "db"),
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-2, 0)+1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS s FROM toks)),
        |cnt AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*)::BIGINT AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db, inter, ca.n AS na, CAST(inter AS DOUBLE) / ca.n AS cont
        |FROM pairs JOIN cnt ca ON da = ca.doc_id
        |WHERE CAST(inter AS DOUBLE) / ca.n >= 0.9
        |ORDER BY da, db""".stripMargin),

    // incremental cross-corpus near-dedup (see [[Dedup.minhashPairsAcross]]):
    // every 10th doc plays the incoming batch, the rest the standing
    // corpus; banded-LSH candidates are batch × corpus ONLY (the corpus
    // never re-pairs with itself — the property that makes nightly
    // incremental dedup affordable), exact-verified at J >= 0.8. Shares
    // the session-cached shingle/sign scan. Oracle = exact cross-split
    // Jaccard (same recall-1 argument as q_dedup_minhash).
    "q_dedup_cross" -> Q(
      (s, d) => {
        val sets = sets3(s, d)
        Dedup.minhashPairsAcross(
            sets.where(col("doc_id") % 10 === 0),
            sets.where(col("doc_id") % 10 =!= 0), 0.8)
          .orderBy("dn", "dc")
      },
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-2, 0)+1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS s FROM toks)),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS dn, b.doc_id AS dc, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        |  GROUP BY 1, 2)
        |SELECT p.dn, p.dc, CAST(p.inter AS DOUBLE)/(ca.n + cb.n - p.inter) AS jac
        |FROM pairs p JOIN cnt ca ON p.dn = ca.doc_id JOIN cnt cb ON p.dc = cb.doc_id
        |WHERE CAST(p.inter AS DOUBLE)/(ca.n + cb.n - p.inter) >= 0.8
        |ORDER BY dn, dc""".stripMargin),

    // corpus-level overlap triage (r16, [[Dedup.corpusOverlap]]): per
    // SOURCE pair, the exact shingle-set Jaccard next to its mergeable
    // md5-MinHash sketch estimate — the decision artifact for which corpus
    // pairs deserve a cross-dedup pass at all. The sketch is the 100 TB
    // path (64 longs per source, element-wise-min mergeable, one scan);
    // the exact side is the harness cross-check. Oracle recomputes the 64
    // universal-hash slot constants from the same md5 formula and replays
    // both Jaccards bit-for-bit (31-bit operands: overflow-free on both
    // engines).
    "q_corpus_overlap" -> Q(
      (s, d) => Dedup.corpusOverlap(Tables.documents(s, d), "source", "text")
        .orderBy("src_a", "src_b"),
      s"""WITH toks AS (
        |  SELECT doc_id, source, $tokSql AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT source AS src, s FROM (
        |    SELECT source, unnest(list_transform(range(1, greatest(len(t)-2, 0)+1),
        |           i -> array_to_string(t[i:i+2], ' '))) AS s FROM toks)),
        |ab AS (SELECT u.i,
        |    ('0x' || substr(md5('sl_a_' || u.i::VARCHAR), 1, 15))::BIGINT
        |      % 2147483646 + 1 AS a,
        |    ('0x' || substr(md5('sl_b_' || u.i::VARCHAR), 1, 15))::BIGINT
        |      % 2147483647 AS b
        |  FROM unnest(range(0, 64)) AS u(i)),
        |h AS (SELECT src,
        |    ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS x
        |  FROM sh),
        |sig AS (SELECT src, ab.i, min((ab.a * h.x + ab.b) % 2147483647) AS m
        |  FROM h CROSS JOIN ab GROUP BY 1, 2),
        |est AS (SELECT a.src AS src_a, b.src AS src_b,
        |    sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END)::DOUBLE / 64 AS est_jaccard
        |  FROM sig a JOIN sig b ON a.i = b.i AND a.src < b.src GROUP BY 1, 2),
        |cnt AS (SELECT src, count(*)::BIGINT AS n FROM sh GROUP BY 1),
        |inter AS (SELECT x.src AS src_a, y.src AS src_b, count(*)::BIGINT AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.src < y.src GROUP BY 1, 2)
        |SELECT e.src_a, e.src_b, ca.n AS n_a, cb.n AS n_b,
        |  COALESCE(i.inter, 0)::DOUBLE / (ca.n + cb.n - COALESCE(i.inter, 0))
        |    AS exact_jaccard,
        |  e.est_jaccard,
        |  abs(e.est_jaccard
        |    - COALESCE(i.inter, 0)::DOUBLE / (ca.n + cb.n - COALESCE(i.inter, 0)))
        |    AS abs_err
        |FROM est e LEFT JOIN inter i USING (src_a, src_b)
        |JOIN cnt ca ON e.src_a = ca.src JOIN cnt cb ON e.src_b = cb.src
        |ORDER BY src_a, src_b""".stripMargin),

    // cluster canonicalization over the EXACT verified near-dup pairs (the
    // same pair set the recursive-CTE oracle closes over — deliberately not
    // the LSH pairs, whose recall is ~1 only probabilistically)
    "q_dedup_clusters" -> Q(
      (s, d) => Dedup.dupClusters(exactPairs08(s, d)).orderBy("doc_id"),
      clustersOracleSql),

    // the DISTRIBUTED components path as its own oracle row (r15): the
    // same semantics forced through the iterative min-label propagation
    // loop (smallGraphMaxEdges = 0 disables the driver union-find gate) —
    // the shape that runs when a 100 TB corpus's duplicate-edge set
    // exceeds broadcast class. Until now this path was spec-exercised but
    // never DuckDB-cross-checked in the driver gate; identical oracle to
    // q_dedup_clusters certifies path equivalence every round.
    "q_dedup_clusters_dist" -> Q(
      (s, d) => Dedup.dupClusters(exactPairs08(s, d), smallGraphMaxEdges = 0L)
        .orderBy("doc_id"),
      clustersOracleSql),

    // canonical-selection dedup: keep the HIGHEST-QUALITY member of every
    // near-dup cluster (not merely the lowest id) — cluster labels from CC
    // over the exact verified pairs, quality from the scoring operator,
    // argmax per cluster via a window. The full composition is oracled:
    // recursive-CTE clusters × the quality formula × the same window.
    "q_dedup_best" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val clusters = Dedup.dupClusters(exactPairs08(s, d))
        val quality = TA.qualityFeatures(docs, "doc_id", "text")
          .select(col("doc_id"), col("quality"))
        val w = Window.partitionBy(col("cluster"))
          .orderBy(col("quality").desc, col("doc_id"))
        clusters.join(quality, "doc_id")
          .withColumn("rk", row_number().over(w))
          .withColumn("n_members", count(lit(1)).over(Window.partitionBy(col("cluster"))))
          .where(col("rk") === 1)
          .select(col("cluster"), col("doc_id").as("best_doc"),
            col("quality").as("best_quality"), col("n_members"))
          .orderBy("cluster")
      },
      s"""WITH RECURSIVE pairs AS (${jaccardSql(0.8).replace("ORDER BY da, db", "")}),
         |sym AS (SELECT da AS a, db AS b FROM pairs
         |        UNION SELECT db AS a, da AS b FROM pairs),
         |reach AS (
         |  SELECT a AS src, b AS dst FROM sym
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
         |),
         |clusters AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster
         |  FROM reach GROUP BY src),
         |t AS (SELECT doc_id, text, $tokSql AS toks FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS BIGINT) AS n_punct,
         |  CAST(${hitsSql("toks", TA.langMarkers("en"))} AS BIGINT) AS n_stopwords
         | FROM t),
         |q AS (SELECT doc_id,
         |  round(least(n_words/100.0, 1.0) * 0.5
         |    + CASE WHEN n_words > 0 THEN least(n_stopwords*10.0/n_words, 1.0) ELSE 0.0 END * 0.3
         |    + (1.0 - CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END) * 0.2,
         |    6) AS quality
         | FROM f)
         |SELECT cluster, best_doc, best_quality, n_members FROM (
         |  SELECT c.cluster, c.doc_id AS best_doc, q.quality AS best_quality,
         |    row_number() OVER (PARTITION BY c.cluster
         |      ORDER BY q.quality DESC, c.doc_id) AS rk,
         |    count(*) OVER (PARTITION BY c.cluster) AS n_members
         |  FROM clusters c JOIN q ON c.doc_id = q.doc_id)
         |WHERE rk = 1 ORDER BY cluster""".stripMargin),

    // provenance-priority dedup: when the same content arrives from
    // several sources (multi-crawl merges), the canonical copy is chosen
    // by source precedence then id — one window over the content digest,
    // only digests shuffle
    "q_dedup_priority" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("h")).orderBy(col("source"), col("doc_id"))
        Tables.documents(s, d)
          .select(md5(col("text").cast("binary")).as("h"), col("source"), col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("h"), col("source"), col("doc_id"))
          .orderBy("h")
      },
      """SELECT h, source, doc_id FROM (
        |  SELECT md5(text) AS h, source, doc_id,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY source, doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY h""".stripMargin),

    // incremental ingest dedup: an incoming batch (doc_id >= 250) is
    // anti-joined on content digest against the already-ingested corpus
    // (doc_id < 250) — the "is this document NEW" gate every continuous
    // training-data pipeline runs. Scale shape: only 16-byte digests
    // shuffle (never documents), and LeftAnti broadcasts when the seen
    // side is a digest table small enough; at larger scale it degrades to
    // a shuffled anti-join on the digest key.
    "q_dedup_novel" -> Q(
      (s, d) => {
        val fp = Tables.documents(s, d)
          .select(col("doc_id"), TA.contentFingerprint(col("text")).as("fp"))
        fp.where(col("doc_id") >= 250)
          .join(fp.where(col("doc_id") < 250).select(col("fp")), Seq("fp"), "left_anti")
          .select(col("doc_id"), col("fp"))
          .orderBy("doc_id")
      },
      """WITH fp AS (SELECT doc_id,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp FROM documents)
        |SELECT doc_id, fp FROM fp
        |WHERE doc_id >= 250
        |  AND fp NOT IN (SELECT fp FROM fp WHERE doc_id < 250)
        |ORDER BY doc_id""".stripMargin),

    // the novelty gate's scale path: the seen corpus compressed to a Bloom
    // filter (built as a bit_or aggregation, broadcast at probe time) —
    // mightContain=false PROVES new, only might-contain rows would need the
    // exact anti-join. Differential oracle: DuckDB replays the md5-60 bit
    // positions, the word-wise bit_or build, the probe, and the exact
    // answer next to it (bloom_new ⇒ exact_new: no false negatives).
    "q_bloom_novel" -> Q(
      (s, d) => {
        val fp = Tables.documents(s, d)
          .select(col("doc_id"), TA.contentFingerprint(col("text")).as("fp"))
        val bloom = BloomFilter.build(fp.where(col("doc_id") < 250), "fp")
        val seen = fp.where(col("doc_id") < 250).select(col("fp").as("seen_fp")).distinct()
        BloomFilter.mightContain(fp.where(col("doc_id") >= 250), bloom, "fp")
          .join(seen, col("fp") === col("seen_fp"), "left")
          .select(col("doc_id"), (!col("mightContain")).as("bloom_new"),
            col("seen_fp").isNull.as("exact_new"))
          .orderBy("doc_id")
      },
      """WITH fp AS (SELECT doc_id,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp FROM documents),
        |posh AS (
        |  SELECT doc_id, fp,
        |    ('0x' || substr(md5('bloom' || k.k::VARCHAR || '_' || fp), 1, 15))::BIGINT % 4096 AS p
        |  FROM fp CROSS JOIN (SELECT unnest(range(0, 3)) AS k) k),
        |bloom AS (
        |  SELECT p // 63 AS w, bit_or(1::BIGINT << (p % 63)::INT) AS bits
        |  FROM posh WHERE doc_id < 250 GROUP BY 1),
        |probe AS (
        |  SELECT ph.doc_id,
        |    bool_and((coalesce(b.bits, 0) & (1::BIGINT << (ph.p % 63)::INT)) <> 0) AS member
        |  FROM posh ph LEFT JOIN bloom b ON ph.p // 63 = b.w
        |  WHERE ph.doc_id >= 250 GROUP BY 1)
        |SELECT p.doc_id, NOT p.member AS bloom_new,
        |  f.fp NOT IN (SELECT fp FROM fp WHERE doc_id < 250) AS exact_new
        |FROM probe p JOIN fp f USING (doc_id) ORDER BY doc_id""".stripMargin),

    // fixed-size per-stratum sample: exactly k docs per lang, chosen by a
    // deterministic seedless hash order (reproducible on any cluster, no
    // RNG state) — the "n examples per language" training-mix primitive.
    // Complements q_sample_stratified (rate-based thinning).
    "q_sample_group" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        GraftFunctions.register(s)
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5Hash60(concat(lit("gsmp_"), col("doc_id").cast("string"))), col("doc_id"))
        Tables.documents(s, d)
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 5)
          .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
          .orderBy("lang", "rk")
      },
      """SELECT lang, rk, doc_id FROM (
        |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |    ORDER BY ('0x' || substr(md5('gsmp_' || doc_id::VARCHAR), 1, 15))::BIGINT, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin),

    // Count-Min-sketched term frequencies for the exact top-20 terms, next
    // to their exact counts — the heavy-hitter primitive when the exact
    // frequency table is too large to materialize. One-sided error
    // (est ≥ exact always; ≤ εN over with prob 1-e^-d). Differential
    // oracle: DuckDB rebuilds every counter from the md5-60 buckets and
    // replays the min-over-rows probe.
    "q_cms_freq" -> Q(
      (s, d) => {
        // ONE tokenize scan: the exact count table feeds both the top-20
        // selection and the (weighted) sketch build — identical counters
        // to building from raw occurrences
        val cnt = tokStream(s, d)
          .groupBy("term").agg(count(lit(1)).as("exact_cnt"))
        val sketch = CountMinSketch.buildWeighted(cnt, "term", "exact_cnt")
        val top = cnt.orderBy(col("exact_cnt").desc, col("term")).limit(20)
        CountMinSketch.estimate(top, sketch, "term")
          .select(col("term"), col("exact_cnt"), col("est"))
          .orderBy("term")
      },
      s"""WITH toks AS (SELECT unnest($tokSql) AS term FROM documents),
         |cnt AS (SELECT term, count(*) AS exact_cnt FROM toks GROUP BY 1),
         |top AS (SELECT term, exact_cnt FROM cnt
         |        ORDER BY exact_cnt DESC, term LIMIT 20),
         |sk AS (
         |  SELECT r, c, count(*) AS cnt FROM (
         |    SELECT r.r,
         |      ('0x' || substr(md5('cms' || r.r::VARCHAR || '_' || term), 1, 15))::BIGINT % 16384 AS c
         |    FROM toks CROSS JOIN (SELECT unnest(range(0, 4)) AS r) r)
         |  GROUP BY 1, 2),
         |est AS (
         |  SELECT t.term, min(coalesce(s.cnt, 0)) AS est FROM (
         |    SELECT term, r.r,
         |      ('0x' || substr(md5('cms' || r.r::VARCHAR || '_' || term), 1, 15))::BIGINT % 16384 AS c
         |    FROM top CROSS JOIN (SELECT unnest(range(0, 4)) AS r) r) t
         |  LEFT JOIN sk s ON t.r = s.r AND t.c = s.c
         |  GROUP BY 1)
         |SELECT top.term, top.exact_cnt, est.est
         |FROM top JOIN est USING (term) ORDER BY term""".stripMargin),

    // Misra-Gries heavy hitters: the DETERMINISTIC no-misses counterpart
    // to the Count-Min path above. Pass 1 reduces every map partition to a
    // ≤ k−1-counter mergeable summary (O(k) on the wire — the reduce side
    // never sees the vocabulary); the guarantee makes the summary keys a
    // superset of every term with freq > n/k under ANY merge order. Pass 2
    // exact-counts only those ≤ k−1 candidates (broadcast literal filter)
    // and keeps the strict `cnt·k > n` survivors — integer compare, so the
    // final set and counts are deterministic even though the MG counter
    // values themselves are not. Oracle = plain exact HAVING; equality
    // holds BECAUSE of the superset guarantee (property-tested under
    // adversarial partitionings in MisraGriesSpec).
    "q_heavy_hitters" -> Q(
      (s, d) => {
        import s.implicits._
        val k = 30
        val toks = tokStream(s, d).select(col("term")).as[String]
        val mg = toks.select(new graft.functions.MisraGriesAggregator(k)
          .toColumn.name("summary")).head()
        val cands = mg.keys.toSeq.sorted // ≤ k−1 items: bounded driver hop
        val total = tokStream(s, d).agg(count(lit(1)).as("n_total"))
        tokStream(s, d)
          .where(col("term").isin(cands: _*))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(total))
          .where(col("cnt") * k > col("n_total"))
          .orderBy("term")
      },
      s"""WITH toks AS (SELECT unnest($tokSql) AS term FROM documents),
         |tot AS (SELECT count(*)::BIGINT AS n_total FROM toks)
         |SELECT term, count(*)::BIGINT AS cnt, (SELECT n_total FROM tot) AS n_total
         |FROM toks GROUP BY term
         |HAVING count(*) * 30 > (SELECT n_total FROM tot)
         |ORDER BY term""".stripMargin),

    // corpus vocabulary: top terms by document frequency
    "q_vocab" -> Q(
      (s, d) => {
        val toks = tokStream(s, d).select("doc_id", "term").distinct()
        toks.groupBy("term").agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("term")).limit(20)
          .orderBy("term")
      },
      """SELECT term, df FROM (
        |  SELECT term, count(*) AS df FROM (
        |    SELECT DISTINCT doc_id, unnest(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
        |    FROM documents)
        |  GROUP BY term ORDER BY df DESC, term LIMIT 20)
        |ORDER BY term""".stripMargin),

    // Heaps'-law VOCABULARY GROWTH curve (r15): cumulative distinct-token
    // count vs cumulative token count in doc_id (reading) order — the
    // corpus statistic vocabulary sizing and tokenizer design read off
    // (V(N) ≈ K·N^β; sublinear growth is what makes a fixed vocab viable).
    // A token's first-occurrence doc is ONE min-aggregate (never a scan
    // ordering dependency), per-doc new-token counts roll up from it, and
    // the doc-order cumulatives use the q_pack_sequences two-phase prefix
    // sum — doc_id block-ranged into 32 partitions, per-range window
    // cumsums in parallel, 32 (tokens, vocab) range totals collected and
    // broadcast back as offsets — so NO single-partition window exists at
    // any corpus size (the driver holds 32 rows, not |docs|).
    "q_vocab_growth" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // r19 note: switching this scan to the session-shared tokStream
        // checkpoint was measured and REVERTED (warm A/B 1.01 → 1.33 s):
        // the private scan fuses tokenization into the partial aggregates,
        // which beats re-reading a 32-partition checkpoint here.
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val tot = toks.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
        val newc = toks.groupBy("tok").agg(min("doc_id").as("fd"))
          .groupBy(col("fd").as("doc_id")).agg(count(lit(1)).as("n_new"))
        val j = tot.join(newc, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_toks"),
            coalesce(col("n_new"), lit(0L)).as("n_new"))
        val parts = 32
        val mx = j.agg(max("doc_id")).collect()(0).getLong(0)
        val block = math.max(1L, (mx + parts) / parts)
        val withPid = j.withColumn("pid", expr(s"doc_id div $block").cast("int"))
        val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
        val totals = withPid.groupBy(col("pid"))
          .agg(sum(col("n_toks")).as("tt"), sum(col("n_new")).as("tv"))
          .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
        val pids = (0 to parts).toSeq
        val offT = pids.scanLeft(0L)((a, p) => a + totals.get(p).map(_._1).getOrElse(0L))
        val offV = pids.scanLeft(0L)((a, p) => a + totals.get(p).map(_._2).getOrElse(0L))
        val offsDf = s.createDataFrame(
          pids.map(p => (p, offT(p), offV(p)))).toDF("pid", "ot", "ov")
        withPid
          .withColumn("ct", sum(col("n_toks")).over(w))
          .withColumn("cv", sum(col("n_new")).over(w))
          .join(broadcast(offsDf), "pid")
          .select(col("doc_id"), col("n_toks"), col("n_new"),
            (col("ot") + col("ct")).as("cum_tokens"),
            (col("ov") + col("cv")).as("cum_vocab"))
          .orderBy("doc_id")
      },
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($tokSql) AS tok FROM documents),
         |tot AS (SELECT doc_id, count(*)::BIGINT AS n_toks FROM toks GROUP BY 1),
         |firsts AS (SELECT tok, min(doc_id) AS fd FROM toks GROUP BY 1),
         |newc AS (SELECT fd AS doc_id, count(*)::BIGINT AS n_new FROM firsts GROUP BY 1),
         |j AS (
         |  SELECT t.doc_id, t.n_toks, coalesce(n.n_new, 0) AS n_new
         |  FROM tot t LEFT JOIN newc n ON t.doc_id = n.doc_id)
         |SELECT doc_id, n_toks, n_new,
         |  sum(n_toks) OVER (ORDER BY doc_id)::BIGINT AS cum_tokens,
         |  sum(n_new) OVER (ORDER BY doc_id)::BIGINT AS cum_vocab
         |FROM j ORDER BY doc_id""".stripMargin),

    // PII-style scrubbing: digits masked, emails-ish collapsed, ws normalized
    "q_scrub" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
              "[0-9]", "#"),
            "\\s+", " ").as("clean"))
        .orderBy("doc_id"),
      """SELECT doc_id,
        | regexp_replace(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |   '[0-9]', '#', 'g'),
        |   '\s+', ' ', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Unicode NFC normalization — the hygiene pass that runs BEFORE every
    // hash-based dedup step: canonically-equivalent strings (e + U+0301 vs
    // the precomposed é) have different bytes, so without it every digest /
    // shingle / minhash treats them as distinct documents and dedup recall
    // silently drops. The harness corpus is ASCII, so the query plants
    // decomposed sequences deterministically (docs whose md5-60 is even get
    // every 'e' replaced by e + COMBINING ACUTE) and the oracle replays the
    // same planting, then both engines normalize: the kernel is
    // `java.text.Normalizer` NFC behind codegen (`TextHashes.nfc`, with a
    // zero-allocation pure-ASCII fast path — the dominant web-corpus case),
    // DuckDB's is utf8proc `nfc_normalize` — two INDEPENDENT implementations
    // of UAX #15 whose composed bytes (and md5 digests) must agree exactly.
    // Scale: per-row projection, zero shuffle, codegen end-to-end.
    "q_normalize_unicode" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        Tables.documents(s, d)
          .select(col("doc_id"),
            when(md5Hash60(col("text")) % 2 === 0,
              regexp_replace(col("text"), "e", "e\u0301"))
              .otherwise(col("text")).as("raw"))
          .select(col("doc_id"),
            length(col("raw")).cast("long").as("n_raw"),
            length(nfcNorm(col("raw"))).cast("long").as("n_nfc"),
            (nfcNorm(col("raw")) =!= col("raw")).as("changed"),
            md5(col("raw").cast("binary")).as("h_raw"),
            md5(nfcNorm(col("raw")).cast("binary")).as("h_nfc"))
          .orderBy("doc_id")
      },
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 2 = 0
        |         THEN regexp_replace(text, 'e', 'e' || chr(769), 'g')
        |         ELSE text END AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  length(raw)::BIGINT AS n_raw,
        |  length(nfc_normalize(raw))::BIGINT AS n_nfc,
        |  nfc_normalize(raw) <> raw AS changed,
        |  md5(raw) AS h_raw,
        |  md5(nfc_normalize(raw)) AS h_nfc
        |FROM raw ORDER BY doc_id""".stripMargin),

    // NFC Unicode-VERSION skew probe (ADVICE r15): q_normalize_unicode only
    // plants U+0301, so a JDK-vs-utf8proc Unicode-table divergence on other
    // code points would never reach the oracle. This row normalizes a
    // curated corpus of combining-mark shapes spanning several Unicode
    // behaviors — 1.1-era composition (e+U+0301), canonical REORDERING
    // (ccc 220 before 230), composition EXCLUSION (U+0915+U+093C must stay
    // decomposed; U+017F+U+0307), a singleton (U+212B → U+00C5), Hangul
    // jamo algorithmic composition, Greek ypogegrammeni ordering, a mark
    // that itself decomposes (U+0344 → U+0308 U+0301), and a modern-era
    // mark (U+1DF8, Unicode 10) interacting with ccc ordering — built from
    // the SAME codepoint literals on both engines, then composed
    // independently by java.text.Normalizer vs utf8proc. Any table skew
    // between the two toolchains' Unicode versions turns a row red.
    "q_nfc_versions" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        import s.implicits._
        nfcProbe.map { case (id, cps) =>
          (id, new String(cps.toArray, 0, cps.length))
        }.toDF("probe_id", "raw")
          .select(col("probe_id"),
            length(col("raw")).cast("long").as("n_raw"),
            length(nfcNorm(col("raw"))).cast("long").as("n_nfc"),
            (nfcNorm(col("raw")) =!= col("raw")).as("changed"),
            md5(nfcNorm(col("raw")).cast("binary")).as("h_nfc"))
          .orderBy("probe_id")
      },
      s"""WITH raw AS (SELECT * FROM (VALUES $nfcProbeSqlValues) AS t(probe_id, raw))
         |SELECT probe_id::BIGINT AS probe_id,
         |  length(raw)::BIGINT AS n_raw,
         |  length(nfc_normalize(raw))::BIGINT AS n_nfc,
         |  nfc_normalize(raw) <> raw AS changed,
         |  md5(nfc_normalize(raw)) AS h_nfc
         |FROM raw ORDER BY probe_id""".stripMargin),

    // full differential oracle: DuckDB replays the 60-bit md5-based simhash
    // (token hash = first 60 bits of md5, majority vote per bit), the
    // 4×15-bit pigeonhole blocking, and the exact Hamming verification —
    // the ALGORITHM is cross-engine checked, not just an aggregate bound
    "q_dedup_simhash" -> Q(
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", 3)
        .orderBy("da", "db"),
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |th AS (
         |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)),
         |bits AS (
         |  SELECT th.doc_id, b.b,
         |         CASE WHEN sum(((h >> b.b) & 1) * 2 - 1) > 0
         |              THEN (1::BIGINT << b.b) ELSE 0 END AS bv
         |  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS b) b
         |  GROUP BY th.doc_id, b.b),
         |sig AS (
         |  SELECT d.doc_id, coalesce(s.sh, 0) AS sh
         |  FROM documents d LEFT JOIN
         |   (SELECT doc_id, sum(bv)::BIGINT AS sh FROM bits GROUP BY 1) s USING (doc_id)),
         |blk AS (
         |  SELECT doc_id, sh, k.k AS blk, (sh >> (k.k * 15)) & 32767 AS bv
         |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
         |         bit_count(xor(a.sh, b.sh))::INT AS hamming
         |  FROM blk a JOIN blk b
         |    ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT da, db, hamming FROM cand WHERE hamming <= 3
         |ORDER BY da, db""".stripMargin),

    "q_dedup_embed" -> Q(
      (s, d) => Dedup.embeddingCosinePairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
        .orderBy("va", "vb"),
      s"""SELECT va, vb, cos FROM (
         | SELECT a.vec_id AS va, b.vec_id AS vb,
         |  ${cosSql("a.embedding", "b.embedding")} AS cos
         | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         |WHERE cos >= 0.4 ORDER BY va, vb""".stripMargin),

    // ---- similarity search ----
    "q_ann_topk" -> Q(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.bruteTopK(e, e.where(col("vec_id") < 10), "vec_id", "embedding", 5)
          .orderBy("qid", "vid")
      },
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |s AS (SELECT q.qid, e.vec_id AS vid, ${cosSql("q.qe", "e.embedding")} AS cos
         |      FROM q JOIN embeddings e ON e.vec_id <> q.qid)
         |SELECT qid, vid, cos FROM (
         |  SELECT qid, vid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn
         |  FROM s)
         |WHERE rn <= 5 ORDER BY qid, vid""".stripMargin),

    // same contract as q_ann_topk, computed by the typed top-k Aggregator
    // (map-side bounded heaps) — shares its oracle
    "q_ann_topk_agg" -> Q(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.aggTopK(e, e.where(col("vec_id") < 10), "vec_id", "embedding", 5)
          .orderBy("qid", "vid")
      },
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |s AS (SELECT q.qid, e.vec_id AS vid, ${cosSql("q.qe", "e.embedding")} AS cos
         |      FROM q JOIN embeddings e ON e.vec_id <> q.qid)
         |SELECT qid, vid, cos FROM (
         |  SELECT qid, vid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn
         |  FROM s)
         |WHERE rn <= 5 ORDER BY qid, vid""".stripMargin),

    // random-projection coarse search (r=16 signed JL dims) + exact
    // rerank of each query's top-20 projected candidates down to top-5.
    // Full differential oracle: DuckDB rebuilds the md5-derived ±1
    // projection ("rp_j_i" salt space) with an ORDERED list_sum — the
    // same sequential double accumulation as the kernel, so projected
    // values, the candidate cut and the reranked cosines are all
    // bit-identical across engines.
    "q_ann_rp" -> Q(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.rpTopK(e, e.where(col("vec_id") < 10), "vec_id", "embedding",
            r = 16, m = 20, k = 5)
          .orderBy("qid", "vid")
      },
      s"""WITH proj AS (
         |  SELECT vec_id,
         |    list_transform(range(0, 16), j ->
         |      list_sum(list_transform(range(0, 64), i ->
         |        (CASE WHEN (('0x' || substr(md5('rp_' || j::VARCHAR || '_' || i::VARCHAR), 1, 1))::BIGINT & 1) = 1
         |              THEN 1.0 ELSE -1.0 END) * CAST(embedding[i + 1] AS DOUBLE)))) AS pv
         |  FROM embeddings),
         |q AS (SELECT vec_id AS qid, pv AS qpv FROM proj WHERE vec_id < 10),
         |coarse AS (
         |  SELECT q.qid, p.vec_id AS vid, ${cosSql("q.qpv", "p.pv")} AS pcos
         |  FROM q JOIN proj p ON p.vec_id <> q.qid),
         |cand AS (
         |  SELECT qid, vid FROM (
         |    SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY pcos DESC, vid) AS rn
         |    FROM coarse)
         |  WHERE rn <= 20)
         |SELECT qid, vid, cos FROM (
         |  SELECT c.qid, c.vid, ${cosSql("qe.embedding", "ve.embedding")} AS cos,
         |    row_number() OVER (PARTITION BY c.qid ORDER BY ${cosSql("qe.embedding", "ve.embedding")} DESC, c.vid) AS rn
         |  FROM cand c JOIN embeddings qe ON qe.vec_id = c.qid
         |              JOIN embeddings ve ON ve.vec_id = c.vid)
         |WHERE rn <= 5 ORDER BY qid, vid""".stripMargin),

    // Retrieval-quality evaluation (r14): the eval-harness primitive a
    // pipeline runs whenever it swaps an ANN index — recall@10, MRR, and
    // nDCG@10 of the (deliberately lossy) single-probe IVF ranking judged
    // against the exact brute-force top-10. Ranks come from the SAME
    // bit-identical cosine contract both ANN rows already prove, so the
    // joined relevance labels are deterministic; DCG/IDCG sum per-rank
    // terms ln(2)/ln(rank+1) ROUNDED to 9 dp as DECIMAL(28,9) (the q_zipf
    // order-free-exact trick — a float sum over an unordered GROUP BY
    // would be engine-dependent), IDCG is computed in-engine from a
    // 10-row range so both engines use their own libm consistently.
    // Scale: both rankings are the ANN queries themselves (broadcast
    // query side, bounded top-k windows); the eval join moves ≤ |Q|·10
    // rows. --
    "q_retrieval_eval" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.DecimalType
        val dec28 = DecimalType(28, 9)
        val e = Tables.embeddings(s, d)
        val q = e.where(col("vec_id") < 10)
        val exact = Similarity.bruteTopK(e, q, "vec_id", "embedding", 10)
          .select(col("qid").as("eqid"), col("vid").as("evid"))
        val approx = Similarity.ivfTopK(e, q, "vec_id", "embedding", "label", 10)
          .withColumn("ar", row_number().over(
            Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))))
        val r = approx.join(exact,
            col("qid") === col("eqid") && col("vid") === col("evid"), "left")
          .select(col("qid"), col("ar"), col("evid").isNotNull.as("rel"))
        val term = round(log(lit(2.0)) / log((col("ar") + 1).cast("double")), 9)
          .cast(dec28)
        val m = r.groupBy("qid").agg(
          sum(when(col("rel"), 1).otherwise(0)).as("nrel"),
          min(when(col("rel"), col("ar"))).as("frank"),
          sum(when(col("rel"), term).otherwise(lit(0).cast(dec28))).as("dcg"))
        val idcg = s.range(1, 11)
          .select(round(log(lit(2.0)) / log((col("id") + 1).cast("double")), 9)
            .cast(dec28).as("t"))
          .agg(sum(col("t")).as("idcg"))
        m.crossJoin(broadcast(idcg))
          .select(col("qid"),
            (col("nrel").cast("double") / lit(10.0)).as("recall10"),
            coalesce(lit(1.0) / col("frank"), lit(0.0)).as("mrr"),
            round(col("dcg").cast("double") / col("idcg").cast("double"), 6)
              .as("ndcg10"))
          .orderBy("qid")
      },
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
         |           FROM embeddings WHERE vec_id < 10),
         |ex AS (SELECT qid, vid FROM (
         |    SELECT q.qid, e.vec_id AS vid,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY ${cosSql("q.qe", "e.embedding")} DESC, e.vec_id) AS rn
         |    FROM q JOIN embeddings e ON e.vec_id <> q.qid)
         |  WHERE rn <= 10),
         |ap AS (SELECT qid, vid, rn AS ar FROM (
         |    SELECT q.qid, e.vec_id AS vid,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY ${cosSql("q.qe", "e.embedding")} DESC, e.vec_id) AS rn
         |    FROM q JOIN embeddings e ON e.vec_id <> q.qid AND e.label = q.ql)
         |  WHERE rn <= 10),
         |r AS (SELECT ap.qid, ap.ar, (ex.vid IS NOT NULL) AS rel
         |      FROM ap LEFT JOIN ex ON ex.qid = ap.qid AND ex.vid = ap.vid),
         |idcg AS (SELECT sum(CAST(round(ln(2.0) / ln(CAST(i + 1 AS DOUBLE)), 9)
         |                         AS DECIMAL(28,9))) AS idcg
         |         FROM (SELECT unnest(range(1, 11)) AS i)),
         |m AS (SELECT qid,
         |    sum(CASE WHEN rel THEN 1 ELSE 0 END) AS nrel,
         |    min(CASE WHEN rel THEN ar END) AS frank,
         |    sum(CASE WHEN rel THEN CAST(round(ln(2.0) / ln(CAST(ar + 1 AS DOUBLE)), 9)
         |                               AS DECIMAL(28,9))
         |             ELSE CAST(0 AS DECIMAL(28,9)) END) AS dcg
         |  FROM r GROUP BY 1)
         |SELECT qid, CAST(nrel AS DOUBLE) / 10.0 AS recall10,
         |  coalesce(1.0::DOUBLE / frank, 0.0::DOUBLE) AS mrr,
         |  round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) AS ndcg10
         |FROM m CROSS JOIN idcg ORDER BY qid""".stripMargin),

    // -- hard-negative mining (r15): for each query, the top-5 most
    //    similar DIFFERENT-label vectors — the contrastive-training data
    //    op (a retrieval/embedding model trains on (query, positive,
    //    hard-negative) triples, and the hard negatives — near misses,
    //    not random draws — are what move the decision boundary). Same
    //    broadcast-queries + per-query bounded-window shape as bruteTopK
    //    with the label-inequality predicate pushed into the join; at
    //    cluster scale the map-side bounded-heap variant (TopKAggregator,
    //    q_ann_topk_agg) swaps in unchanged. --
    "q_mine_hard_negatives" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        GraftFunctions.register(s)
        val e = Tables.embeddings(s, d)
        val q = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            col("label").as("ql"))
        val scored = e.join(broadcast(q),
            col("vec_id") =!= col("qid") && col("label") =!= col("ql"))
          .select(col("qid"), col("vec_id").as("vid"),
            cosineSim(col("qv"), col("embedding")).as("cos"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 5)
          .select(col("qid"), col("vid"), col("cos"), col("rank"))
          .orderBy("qid", "rank")
      },
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
         |           FROM embeddings WHERE vec_id < 10)
         |SELECT qid, vid, cos, rn AS rank FROM (
         |  SELECT q.qid, e.vec_id AS vid, ${cosSql("q.qe", "e.embedding")} AS cos,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY ${cosSql("q.qe", "e.embedding")} DESC, e.vec_id) AS rn
         |  FROM q JOIN embeddings e ON e.vec_id <> q.qid AND e.label <> q.ql)
         |WHERE rn <= 5 ORDER BY qid, rank""".stripMargin),

    // -- rank-biased overlap (r15): RBO@10, p = 0.9 — the top-weighted
    //    rank-agreement metric between the exact and the IVF rankings,
    //    completing the retrieval-eval suite (recall counts membership,
    //    nDCG weights graded relevance, RBO compares the ORDERINGS
    //    themselves, discounting depth geometrically). Truncated prefix
    //    form: (1−p)·Σ_{d=1..10} p^{d−1}·|A_d ∩ B_d|/d — a lower bound of
    //    the full RBO, labeled as such. Float parity: each depth term is
    //    rounded to 9 dp and summed as DECIMAL(28,9) (order-free exact,
    //    the q_retrieval_eval discipline); overlap@d derives from matched
    //    items' max(rank_A, rank_B) ≤ d — integers end to end. Scale:
    //    both rankings are bounded top-k windows; the eval joins move
    //    ≤ |Q|·k² tiny rows. --
    "q_retrieval_rbo" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.DecimalType
        val dec28 = DecimalType(28, 9)
        val e = Tables.embeddings(s, d)
        val q = e.where(col("vec_id") < 10)
        def ranked(df: DataFrame, rc: String) = df.withColumn(rc,
          row_number().over(Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))))
        val exact = ranked(Similarity.bruteTopK(e, q, "vec_id", "embedding", 10), "er")
          .select(col("qid"), col("vid"), col("er"))
        val approx = ranked(Similarity.ivfTopK(e, q, "vec_id", "embedding", "label", 10), "ar")
          .select(col("qid").as("aqid"), col("vid").as("avid"), col("ar"))
        val matched = exact.join(approx,
            col("qid") === col("aqid") && col("vid") === col("avid"))
          .select(col("qid"), greatest(col("er"), col("ar")).as("m"))
        val grid = q.select(col("vec_id").as("qid"))
          .crossJoin(broadcast(s.range(1, 11).select(col("id").as("d"))))
        val od = grid.join(matched, Seq("qid"), "left_outer")
          .groupBy(col("qid"), col("d"))
          .agg(sum(when(col("m") <= col("d"), 1L).otherwise(0L)).as("ov"))
        val term = round(
          pow(lit(0.9), (col("d") - 1).cast("double")) *
            (col("ov").cast("double") / col("d").cast("double")), 9).cast(dec28)
        od.groupBy(col("qid"))
          .agg(max(when(col("d") === 10, col("ov"))).as("overlap10"),
            sum(term).as("ts"))
          .select(col("qid"), col("overlap10"),
            round(lit(0.1) * col("ts").cast("double"), 6).as("rbo10"))
          .orderBy("qid")
      },
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
         |           FROM embeddings WHERE vec_id < 10),
         |ex AS (SELECT qid, vid, rn AS er FROM (
         |    SELECT q.qid, e.vec_id AS vid,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY ${cosSql("q.qe", "e.embedding")} DESC, e.vec_id) AS rn
         |    FROM q JOIN embeddings e ON e.vec_id <> q.qid)
         |  WHERE rn <= 10),
         |ap AS (SELECT qid, vid, rn AS ar FROM (
         |    SELECT q.qid, e.vec_id AS vid,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY ${cosSql("q.qe", "e.embedding")} DESC, e.vec_id) AS rn
         |    FROM q JOIN embeddings e ON e.vec_id <> q.qid AND e.label = q.ql)
         |  WHERE rn <= 10),
         |mt AS (SELECT ex.qid, greatest(er, ar) AS m
         |       FROM ex JOIN ap ON ap.qid = ex.qid AND ap.vid = ex.vid),
         |dd AS (SELECT unnest(range(1, 11)) AS d),
         |od AS (SELECT qq.qid, dd.d,
         |    sum(CASE WHEN mt.m <= dd.d THEN 1 ELSE 0 END)::BIGINT AS ov
         |  FROM (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 10) qq
         |  CROSS JOIN dd LEFT JOIN mt ON mt.qid = qq.qid
         |  GROUP BY 1, 2)
         |SELECT qid, max(CASE WHEN d = 10 THEN ov END) AS overlap10,
         |  round(0.1 * CAST(sum(CAST(round(power(0.9, CAST(d - 1 AS DOUBLE))
         |    * (CAST(ov AS DOUBLE) / CAST(d AS DOUBLE)), 9) AS DECIMAL(28,9)))
         |    AS DOUBLE), 6) AS rbo10
         |FROM od GROUP BY qid ORDER BY qid""".stripMargin),

    "q_ann_ivf" -> Q(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.ivfTopK(e, e.where(col("vec_id") < 10), "vec_id", "embedding", "label", 5)
          .orderBy("qid", "vid")
      },
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql FROM embeddings WHERE vec_id < 10),
         |s AS (SELECT q.qid, e.vec_id AS vid, ${cosSql("q.qe", "e.embedding")} AS cos
         |      FROM q JOIN embeddings e ON e.vec_id <> q.qid AND e.label = q.ql)
         |SELECT qid, vid, cos FROM (
         |  SELECT qid, vid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn
         |  FROM s)
         |WHERE rn <= 5 ORDER BY qid, vid""".stripMargin),

    // full differential oracle of the hyperplane-LSH pipeline: DuckDB
    // rebuilds the md5-derived ±1 planes, the adaptive-width sign buckets
    // per table, the bucket-collision candidates, and the exact cosine
    // verification. (Recall vs the exact pair set is a property of the
    // parameters, measured in SimilaritySpec; this row checks that the
    // ALGORITHM computes identically on both engines.)
    // The registered row runs the AUTO width (VERDICT r7 #2): bits =
    // clamp(8, ceil(log2(n))+1, 28) derived from the corpus count at call
    // time, so the 64× ladder rung hashes 18-bit buckets instead of
    // overflowing 12-bit ones. The oracle derives the SAME width from the
    // same count with integer bit-length arithmetic (`bw` CTE) — the scale
    // configuration is itself oracle-checked at every sf.
    "q_ann_lsh" -> Q(
      (s, d) => Similarity.lshCosinePairsAuto(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
        .orderBy("va", "vb"),
      s"""WITH bw AS (
         |  SELECT greatest(8, least(28,
         |    length(bin(greatest(count(*), 2) - 1)) + 1)) AS bits
         |  FROM embeddings),
         |planes AS (
         |  SELECT t.t, j.j, i.i,
         |    CASE WHEN (('0x' || substr(md5(t.t::VARCHAR || '_' || j.j::VARCHAR || '_' || i.i::VARCHAR), 1, 1))::BIGINT & 1) = 1
         |         THEN 1.0 ELSE -1.0 END AS s
         |  FROM (SELECT unnest(range(0, 8)) AS t) t
         |  CROSS JOIN (SELECT unnest(range(0, (SELECT bits FROM bw))) AS j) j
         |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i),
         |dots AS (
         |  SELECT e.vec_id, p.t, p.j, sum(p.s * e.embedding[p.i + 1]) AS dot
         |  FROM embeddings e CROSS JOIN planes p
         |  GROUP BY 1, 2, 3),
         |buckets AS (
         |  SELECT vec_id, t,
         |    sum(CASE WHEN dot > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
         |  FROM dots GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
         |  FROM buckets a JOIN buckets b
         |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT va, vb, cos FROM (
         |  SELECT c.va, c.vb, ${cosSql("ea.embedding", "eb.embedding")} AS cos
         |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.va
         |              JOIN embeddings eb ON eb.vec_id = c.vb)
         |WHERE cos >= 0.4 ORDER BY va, vb""".stripMargin),

    // k-NN GRAPH (r15): every vector's top-5 neighbors — the SemDeDup /
    // mutual-kNN / diversity-sampling precursor where Q = the corpus (so
    // no broadcast query set exists). LSH sign-bucket candidates at no
    // cosine floor, exact cosine once per undirected pair, both directed
    // orientations from ONE pass, per-source top-k window. The oracle
    // replays the identical md5-derived planes + adaptive width, then the
    // same symmetrize + rank — the LSH approximation itself is checked.
    "q_knn_graph" -> Q(
      (s, d) => Similarity.knnGraph(Tables.embeddings(s, d), "vec_id", "embedding", 5)
        .orderBy("src", "rank"),
      s"""WITH $knnCtes
         |SELECT src, dst, cos, rank::BIGINT AS rank
         |FROM rk WHERE rank <= 5 ORDER BY src, rank""".stripMargin),

    // INCREMENTAL kNN-graph maintenance (r15): every 10th vector plays the
    // nightly delta (the q_dedup_cross convention); the standing
    // corpus-only graph merges with delta-touching LSH candidates ONLY
    // (cost ∝ |delta|·tables + collisions, never corpus²) and the merge is
    // EXACT — corpus×corpus candidates are identical in both passes under
    // the pinned full-count bucket width, so the oracle is the FULL-graph
    // recompute verbatim: the incremental algebra itself is what the
    // cross-check certifies (q_ivm_agg/q_ivm_join extended to a
    // similarity index).
    "q_ivm_knn" -> Q(
      (s, d) => Similarity.knnGraphIncremental(Tables.embeddings(s, d),
          "vec_id", "embedding", 5, col("vec_id") % 10 === 0)
        .orderBy("src", "rank"),
      s"""WITH $knnCtes
         |SELECT src, dst, cos, rank::BIGINT AS rank
         |FROM rk WHERE rank <= 5 ORDER BY src, rank""".stripMargin),

    // mutual-kNN SEMANTIC CLUSTERS (r15): the SemDeDup-style composition —
    // an undirected edge survives only when BOTH endpoints rank each other
    // in their top-5 (mutuality prunes hub edges, the standard kNN-graph
    // denoiser) and the exact cosine clears 0.3; connected components over
    // the surviving edges are the semantic groups. The oracle replays the
    // whole stack: kNN CTEs -> pair-count mutuality -> recursive-CTE
    // transitive closure (the q_dedup_clusters discipline). Scale: the
    // mutuality check is ONE unordered-pair aggregate over the graph
    // (count = 2 <=> mutual), components run on edges ∝ cluster density,
    // never on the corpus.
    "q_knn_clusters" -> Q(
      (s, d) => {
        val g = Similarity.knnGraph(Tables.embeddings(s, d), "vec_id", "embedding", 5)
        val mutual = g
          .select(least(col("src"), col("dst")).as("da"),
            greatest(col("src"), col("dst")).as("db"), col("cos"))
          .groupBy("da", "db")
          .agg(count(lit(1)).as("n"), min("cos").as("cos"))
          .where(col("n") === 2 && col("cos") >= 0.3)
          .select(col("da"), col("db"))
        Dedup.dupClusters(mutual)
          .withColumnRenamed("doc_id", "vec_id").orderBy("vec_id")
      },
      s"""WITH RECURSIVE $knnCtes,
         |knn AS (SELECT src, dst, cos FROM rk WHERE rank <= 5),
         |und AS (
         |  SELECT least(src, dst) AS da, greatest(src, dst) AS db,
         |    count(*) AS n, min(cos) AS cos
         |  FROM knn GROUP BY 1, 2),
         |mut AS (SELECT da, db FROM und WHERE n = 2 AND cos >= 0.3),
         |msym AS (SELECT da AS a, db AS b FROM mut
         |         UNION SELECT db AS a, da AS b FROM mut),
         |reach AS (
         |  SELECT a AS src, b AS dst FROM msym
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN msym e ON r.dst = e.a)
         |SELECT src AS vec_id, least(src, min(dst)) AS cluster
         |FROM reach GROUP BY src ORDER BY vec_id""".stripMargin),

    // RECALL-CONTRACT variant: both dials derived — bits from the corpus
    // count (adaptiveBits, as q_ann_lsh), tables from the recall target
    // via the analytic model the round-9 ladder probe measured
    // trustworthy (LshRecallProbe: within ~1pp at 12/10/18 bits). The
    // oracle re-derives BOTH from its own count with the same arithmetic
    // (integer bit-length for bits; acos/ln/power for tables — the ceil
    // lands far from integer boundaries at every sf: 500 vecs -> 10 bits
    // x 13 tables, 2k -> 12 x 18), so the full scale-and-recall
    // configuration is itself the checked artifact.
    "q_ann_lsh_target" -> Q(
      (s, d) => Similarity.lshCosinePairsRecall(Tables.embeddings(s, d), "vec_id", "embedding",
          0.4, targetRecall = 0.95, designCos = 0.9)
        .orderBy("va", "vb"),
      s"""WITH bw AS (
         |  SELECT greatest(8, least(28,
         |    length(bin(greatest(count(*), 2) - 1)) + 1)) AS bits
         |  FROM embeddings),
         |pr AS (
         |  SELECT least(128, greatest(1,
         |    ceil(ln(1.0 - 0.95) /
         |         ln(1.0 - power(1.0 - acos(least(0.9, 1.0)) / pi(), bits)))::INT)) AS tables
         |  FROM bw),
         |planes AS (
         |  SELECT t.t, j.j, i.i,
         |    CASE WHEN (('0x' || substr(md5(t.t::VARCHAR || '_' || j.j::VARCHAR || '_' || i.i::VARCHAR), 1, 1))::BIGINT & 1) = 1
         |         THEN 1.0 ELSE -1.0 END AS s
         |  FROM (SELECT unnest(range(0, (SELECT tables FROM pr))) AS t) t
         |  CROSS JOIN (SELECT unnest(range(0, (SELECT bits FROM bw))) AS j) j
         |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i),
         |dots AS (
         |  SELECT e.vec_id, p.t, p.j, sum(p.s * e.embedding[p.i + 1]) AS dot
         |  FROM embeddings e CROSS JOIN planes p
         |  GROUP BY 1, 2, 3),
         |buckets AS (
         |  SELECT vec_id, t,
         |    sum(CASE WHEN dot > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
         |  FROM dots GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
         |  FROM buckets a JOIN buckets b
         |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT va, vb, cos FROM (
         |  SELECT c.va, c.vb, ${cosSql("ea.embedding", "eb.embedding")} AS cos
         |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.va
         |              JOIN embeddings eb ON eb.vec_id = c.vb)
         |WHERE cos >= 0.4 ORDER BY va, vb""".stripMargin),

    // MEASURED recall of the sub-quadratic LSH path against the exact
    // tiled pairs, on PLANTED near-duplicates (the harness embeddings are
    // random, so no natural high-cos pairs exist — VERDICT r3 #6). Each of
    // the first 64 vectors gets a twin with per-dim ±50% multiplicative
    // perturbation (signs from md5, replayable), which lands pairs at
    // cos ≈ 0.89 (θ ≈ 0.15π) — squarely where 12-bit × 8-table LSH recall
    // is a nontrivial ~0.7, not the degenerate 1.0 of verbatim copies.
    // Output: one row per EXACT pair ≥ 0.8 with whether LSH found it and
    // the analytic per-pair recall 1-(1-(1-θ/π)^bits)^tables — the row set
    // IS the measured-recall table, hash-matched against DuckDB replaying
    // the whole construction (plant → union → tiled exact → planes →
    // buckets → verify). This green row blesses lshCosinePairs as the
    // scale alternative to the Θ(n²) q_dedup_embed.
    "q_ann_lsh_recall" -> Q(
      (s, d) => {
        val u = plantedTwinCorpus(s, d)
        val exact = Dedup.embeddingCosinePairs(u, "vec_id", "embedding", 0.8)
        val lsh = Similarity.lshCosinePairs(u, "vec_id", "embedding", 0.8)
          .select(col("va").as("lva"), col("vb").as("lvb"))
        exact.join(lsh, col("va") === col("lva") && col("vb") === col("lvb"), "left")
          .select(col("va"), col("vb"), col("cos"),
            col("lva").isNotNull.as("lsh_found"),
            round(lit(1.0) - pow(lit(1.0) - pow(lit(1.0) -
              acos(least(greatest(col("cos"), lit(-1.0)), lit(1.0))) / lit(math.Pi),
              lit(12.0)), lit(8.0)), 4).as("recall_bound"))
          .orderBy("va", "vb")
      },
      s"""WITH $plantedUnionCtes,
         |exact AS (
         |  SELECT va, vb, cos FROM (
         |    SELECT a.vec_id AS va, b.vec_id AS vb, ${cosSql("a.embedding", "b.embedding")} AS cos
         |    FROM u a JOIN u b ON a.vec_id < b.vec_id)
         |  WHERE cos >= 0.8),
         |$lshPairCtes08
         |SELECT e.va, e.vb, e.cos, (l.va IS NOT NULL) AS lsh_found,
         |  round(1.0 - power(1.0 - power(1.0 - acos(least(greatest(e.cos, -1.0), 1.0))/pi(), 12.0), 8.0), 4) AS recall_bound
         |FROM exact e LEFT JOIN lsh l ON e.va = l.va AND e.vb = l.vb
         |ORDER BY e.va, e.vb""".stripMargin),

    // PRODUCTION-RECALL variant (VERDICT r6 #5): the 12-bit × 8-table
    // default measures ~0.7 recall at the planted difficulty (cos ≈ 0.89)
    // — thin for a dedup contract. Dropping to 10 bits and doubling to 16
    // tables raises the analytic per-pair recall at cos 0.89 to
    // 1-(1-0.8493^10)^16 ≈ 0.97 at ~2.7× the hashing work (160 vs 96
    // plane dots per vector) and a wider candidate set (coarser buckets:
    // random pairs collide per table at ~2^-10 instead of ~2^-12 — still
    // O(n·tables) candidates, and at larger n the bits should scale back
    // up with log n). Same planted corpus, same construction, fully
    // replayed by the oracle; `measured_recall` (constant over rows) IS
    // the round's measured number — the done-gate asserts it ≥ 0.9.
    "q_ann_lsh_recall_hi" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val u = plantedTwinCorpus(s, d)
        val exact = Dedup.embeddingCosinePairs(u, "vec_id", "embedding", 0.8)
        val lsh = Similarity.lshCosinePairs(u, "vec_id", "embedding", 0.8,
            bits = 10, tables = 16)
          .select(col("va").as("lva"), col("vb").as("lvb"))
        exact.join(lsh, col("va") === col("lva") && col("vb") === col("lvb"), "left")
          .select(col("va"), col("vb"), col("cos"),
            col("lva").isNotNull.as("lsh_found"),
            round(lit(1.0) - pow(lit(1.0) - pow(lit(1.0) -
              acos(least(greatest(col("cos"), lit(-1.0)), lit(1.0))) / lit(math.Pi),
              lit(10.0)), lit(16.0)), 4).as("recall_bound"))
          .withColumn("measured_recall",
            round(avg(col("lsh_found").cast("double"))
              .over(Window.partitionBy()), 4))
          .orderBy("va", "vb")
      },
      s"""WITH $plantedUnionCtes,
         |exact AS (
         |  SELECT va, vb, cos FROM (
         |    SELECT a.vec_id AS va, b.vec_id AS vb, ${cosSql("a.embedding", "b.embedding")} AS cos
         |    FROM u a JOIN u b ON a.vec_id < b.vec_id)
         |  WHERE cos >= 0.8),
         |${lshPairCtes(0.8, 10, 16)}
         |SELECT va, vb, cos, lsh_found,
         |  round(1.0 - power(1.0 - power(1.0 - acos(least(greatest(cos, -1.0), 1.0))/pi(), 10.0), 16.0), 4) AS recall_bound,
         |  round(avg(CASE WHEN lsh_found THEN 1.0 ELSE 0.0 END) OVER (), 4) AS measured_recall
         |FROM (
         |  SELECT e.va, e.vb, e.cos, (l.va IS NOT NULL) AS lsh_found
         |  FROM exact e LEFT JOIN lsh l ON e.va = l.va AND e.vb = l.vb)
         |ORDER BY va, vb""".stripMargin),

    // The hybrid dedup pipeline the 100 TB path actually runs: LSH bucket
    // candidates → exact cosine verify (inside lshCosinePairsRecall) →
    // connected components → min-id canonical label per member. Same
    // planted-twin corpus as q_ann_lsh_recall: that row measures the PAIR
    // recall of the pinned 12×8 width; this one runs the RECALL-CONTRACT
    // entry point (bits from count(u), tables from the ≥0.95 target at
    // designCos 0.9 — the same derivation q_ann_lsh_target oracle-checks)
    // and blesses the dedup-shaped OUTPUT built from those pairs, with the
    // oracle replaying plant → dials → planes → buckets → verify →
    // recursive closure end-to-end. Unlike q_dedup_clusters (which
    // deliberately consumes EXACT pairs), the planted twins sit at
    // cos ≈ 0.89 pairwise with singleton-or-pair components.
    "q_dedup_embed_lsh" -> Q(
      (s, d) => {
        val u = plantedTwinCorpus(s, d)
        // RECALL-CONTRACT dials (r10, VERDICT r9 #1): the blessed dedup
        // recipe sizes bits from the corpus it hashes and tables from the
        // ≥0.95 recall target at the cos 0.9 design angle — the fixed 12×8
        // default measured ~0.7 recall at the planted difficulty and is
        // quadratic-shaped at 128 k. The pinned-width rows
        // (q_ann_lsh_recall / _hi) stay for recall-curve comparability.
        val pairs = Similarity.lshCosinePairsRecall(u, "vec_id", "embedding",
            0.8, targetRecall = 0.95, designCos = 0.9)
          .select(col("va").as("da"), col("vb").as("db"))
        Dedup.dupClusters(pairs)
          .select(col("doc_id").as("vec_id"), col("cluster"))
          .orderBy("vec_id")
      },
      s"""WITH RECURSIVE $plantedUnionCtes,
         |${lshPairCtesRecall(0.8, 0.95, 0.9)},
         |sym AS (SELECT va AS a, vb AS b FROM lsh
         |        UNION SELECT vb AS a, va AS b FROM lsh),
         |reach AS (
         |  SELECT a AS src, b AS dst FROM sym
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
         |)
         |SELECT src AS vec_id, least(src, min(dst)) AS cluster
         |FROM reach GROUP BY src ORDER BY vec_id""".stripMargin),

    // deterministic integer-lattice k-means (k=8, 2 Lloyd iterations) —
    // the offline coarse-quantizer build behind IVF, differentially
    // oracled end-to-end: quantization, exact integer distances, tie-broken
    // assignment, round(mean) centroid updates, final per-cluster inertia
    // are all replayed by DuckDB
    "q_ann_kmeans" -> Q(
      (s, d) => kmeansFit(s, d)
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), sum(col("dist")).as("inertia"))
        .orderBy("cid"),
      s"""$kmeansCtes
         |SELECT cid, count(*) AS n, CAST(sum(dist) AS BIGINT) AS inertia
         |FROM a2 GROUP BY 1 ORDER BY cid""".stripMargin),

    // Simplified (centroid-based) silhouette — the clustering-quality
    // readout for the fitted codebook: per vector, a = squared integer
    // distance to its own centroid (already on the cached assignment),
    // b = min squared distance to any OTHER centroid, s = (b−a)/max(a,b).
    // a and b are exact int64, so s is one IEEE division; per-cluster
    // means sum the 9-dp-rounded s as DECIMAL(28,9) (order-free exact)
    // with a single double division at the end — the q_zipf float-hygiene
    // recipe.
    //
    // Shape (r18): b is ONE MAP over the cached assignment (which already
    // carries the quantized vector) against the k-row codebook folded
    // into a single broadcast array — min over the k−1 other centroids
    // inline per row. The previous formulation expanded n×k rows through
    // a vec_id-keyed shuffle join + groupBy(vec_id) min; at x256 those
    // 10 M array-carrying rows were pure allocation churn (the measured
    // 6.7–77 s GC-bimodal rung, SCALE.md r18) for an answer a per-row
    // fold computes with no exchange at all. Only the |k|-sized final
    // rollup shuffles. Oracle unchanged — same a, b, rounding. --
    "q_silhouette" -> Q(
      (s, d) => {
        val fit = kmeansFit(s, d) // (vec_id, v, cid, dist) — checkpointed
        val codebook = kmeansCents(s, d)
          .agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cbk"))
        fit.crossJoin(broadcast(codebook))
          .select(col("cid"), col("dist").as("a"),
            aggregate(
              filter(col("cbk"), c => c.getField("cid") =!= col("cid")),
              lit(Long.MaxValue),
              (acc, c) => least(acc, KMeansQuant.sqDist(col("v"), c.getField("cv"))))
              .as("b"),
            // a dead-cluster codebook of size 1 has no "other" centroid;
            // the old inner join dropped such rows — keep that contract
            size(filter(col("cbk"), c => c.getField("cid") =!= col("cid"))).as("n_others"))
          .where(col("n_others") > 0)
          .select(col("cid"),
            round(when(greatest(col("a"), col("b")) === 0L, lit(0.0))
              .otherwise((col("b") - col("a")).cast("double") /
                greatest(col("a"), col("b"))), 9).as("sil"))
          .groupBy(col("cid"))
          .agg(count(lit(1)).as("n"),
            (sum(col("sil").cast(org.apache.spark.sql.types.DecimalType(28, 9)))
              .cast("double") / count(lit(1))).as("mean_sil"))
          .orderBy("cid")
      },
      s"""$kmeansCtes,
         |b AS (SELECT d2.vec_id, min(d2.dist) AS b
         |      FROM d2 JOIN a2 USING (vec_id) WHERE d2.cid <> a2.cid
         |      GROUP BY 1),
         |sil AS (SELECT a2.cid,
         |    round(CASE WHEN greatest(a2.dist, b.b) = 0 THEN 0.0
         |      ELSE (b.b - a2.dist)::DOUBLE / greatest(a2.dist, b.b) END, 9) AS s
         |  FROM a2 JOIN b USING (vec_id))
         |SELECT cid, count(*)::BIGINT AS n,
         |  CAST(sum(CAST(s AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS mean_sil
         |FROM sil GROUP BY cid ORDER BY cid""".stripMargin),

    // Semantic dedup (SemDeDup-shape): cluster embeddings with the fitted
    // k-means codebook, then WITHIN each cell drop any vector that has an
    // earlier-id neighbor at cosine >= 0.8 (deterministic keeper rule, no
    // iteration). The clustering is what makes it scale: candidate pairs
    // are O(sum |cell|^2), never O(n^2) — a production run additionally
    // caps cell size (re-clusters oversized cells), which changes the
    // constant, not the shape. The oracle replays the identical k-means
    // fit (kmeansCtes) and the identical pair predicate, so the
    // by-design-approximate answer still matches exactly.
    "q_dedup_semantic" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val cells = kmeansFit(s, d).select(col("vec_id"), col("cid"))
        val e = Tables.embeddings(s, d).join(cells, "vec_id")
        val x = e.select(col("cid"), col("vec_id").as("va"), col("embedding").as("ea"))
        val y = e.select(col("cid"), col("vec_id").as("vb"), col("embedding").as("eb"))
        val dropped = x.join(y, "cid")
          .where(col("va") > col("vb") && cosineSim(col("ea"), col("eb")) >= 0.8)
          .select(col("va").as("vec_id")).distinct()
        cells.join(dropped, Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("cid"))
          .orderBy("vec_id")
      },
      s"""$kmeansCtes,
         |cells AS (SELECT vec_id, cid FROM a2),
         |p AS (
         |  SELECT cx.vec_id AS va
         |  FROM cells cx JOIN cells cy ON cx.cid = cy.cid AND cx.vec_id > cy.vec_id
         |       JOIN embeddings x ON x.vec_id = cx.vec_id
         |       JOIN embeddings y ON y.vec_id = cy.vec_id
         |  WHERE ${cosSql("x.embedding", "y.embedding")} >= 0.8)
         |SELECT c.vec_id, c.cid FROM cells c
         |WHERE c.vec_id NOT IN (SELECT va FROM p)
         |ORDER BY c.vec_id""".stripMargin),

    // Embedding-space outlier pruning (r14): diagonal-Mahalanobis distance
    // to the corpus centroid — the curation gate that drops vectors far
    // from the data manifold before they poison nearest-neighbor
    // structure. Mean and per-dim variance come from the SAME exact
    // CovAggregator buffer as the PCA family (μ_k = s_k/n and σ²_k =
    // covq's diagonal — one IEEE division each from exact ints), the
    // distance is a zero-shuffle ordered fold per row, and the top-20 is
    // a TakeOrdered — never a global sort. d² = Σ((x_k−μ_k)/2²⁰-grid …)²
    // uses raw doubles against the quantized moments, mirrored
    // token-for-token by the oracle. --
    "q_embed_outliers" -> Q(
      (s, d) => {
        val dim = PcaDim
        val buf = pcaCovBuffer(s, d)
        val n = buf(0)
        val mu = Array.tabulate(dim)(k =>
          buf(1 + k).toDouble / n.toDouble / 1048576.0)
        val sg = Array.tabulate(dim) { k =>
          val skk = buf(1 + dim + k * dim - k * (k - 1) / 2)
          (n.toDouble * skk.toDouble - buf(1 + k).toDouble * buf(1 + k).toDouble) /
            (n.toDouble * n.toDouble * 1048576.0 * 1048576.0)
        }
        val muL = array(mu.map(lit).toIndexedSeq: _*)
        val sgL = array(sg.map(lit).toIndexedSeq: _*)
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            round(aggregate(
              zip_with(
                zip_with(transform(col("embedding"), x => x.cast("double")),
                  muL, (x, m) => x - m),
                sgL, (dv, v) => dv * dv / v),
              lit(0.0), (a, c) => a + c), 9).as("maha2"))
          .orderBy(col("maha2").desc, col("vec_id"))
          .limit(20)
      },
      s"""WITH $pcaCovSql,
        |mo AS (SELECT list(s_i::DOUBLE / n::DOUBLE / 1048576.0 ORDER BY i) AS mu,
        |    list(cov ORDER BY i) AS sg
        |  FROM covq WHERE i = j)
        |SELECT vec_id, round(list_reduce(list_prepend(0.0,
        |    list_transform(range(1, 65), k ->
        |      (embedding[k]::DOUBLE - mo.mu[k]) * (embedding[k]::DOUBLE - mo.mu[k])
        |        / mo.sg[k])),
        |  (a, b) -> a + b), 9) AS maha2
        |FROM embeddings CROSS JOIN mo
        |ORDER BY maha2 DESC, vec_id LIMIT 20""".stripMargin),

    // Cluster-BALANCED sampling (r14): after clustering, curation takes a
    // bounded, diverse subset — ≤ 32 per k-means cell by deterministic
    // hash rank (md5-60("cb_" + vec_id)), so dominant clusters stop
    // drowning out rare ones and the draw is bit-reproducible across
    // runs, engines and retries. Rank-within-partition + filter (the
    // q_group_topk shape — never a global sort); the window runs on the
    // TINY (vec_id, cid) assignment, not on vectors. --
    "q_sample_cluster" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        GraftFunctions.register(s)
        val w = Window.partitionBy(col("cid"))
          .orderBy(col("h"), col("vec_id"))
        kmeansFit(s, d).select(col("vec_id"), col("cid"))
          .withColumn("h", md5Hash60(concat(lit("cb_"),
            col("vec_id").cast("string"))))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 32)
          .select(col("cid"), col("rk").cast("long").as("rk"), col("vec_id"))
          .orderBy("cid", "rk")
      },
      s"""$kmeansCtes,
         |h AS (SELECT cid, vec_id,
         |    ('0x' || substr(md5('cb_' || vec_id::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM a2),
         |r AS (SELECT cid, vec_id,
         |    row_number() OVER (PARTITION BY cid ORDER BY h, vec_id) AS rk
         |  FROM h)
         |SELECT cid, rk::BIGINT AS rk, vec_id FROM r WHERE rk <= 32
         |ORDER BY cid, rk""".stripMargin),

    // IVF over the FITTED codebook (no label stand-in): every vector lives
    // in its k-means cell; a query probes its own cell's inverted list.
    // Same algorithm replayed by the oracle, so the (by-design approximate)
    // cell-probe answer is still an exact cross-engine match.
    "q_ann_ivf_kmeans" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val emb = Tables.embeddings(s, d)
        val cells = kmeansFit(s, d).select(col("vec_id"), col("cid"))
        val e = emb.join(cells, "vec_id")
        val qs = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cid"))
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
        qs.join(e.select(col("vec_id").as("vid"), col("embedding").as("ve"), col("cid")), "cid")
          .where(col("vid") =!= col("qid"))
          .select(col("qid"), col("vid"), cosineSim(col("qe"), col("ve")).as("cos"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 5)
          .select(col("qid"), col("vid"), col("cos"))
          .orderBy("qid", "vid")
      },
      s"""$kmeansCtes,
         |cells AS (SELECT vec_id, cid FROM a2),
         |qs AS (
         |  SELECT e.vec_id AS qid, e.embedding AS qe, c.cid
         |  FROM embeddings e JOIN cells c USING (vec_id) WHERE e.vec_id < 10),
         |cn AS (
         |  SELECT qs.qid, e.vec_id AS vid, ${cosSql("qs.qe", "e.embedding")} AS cos
         |  FROM qs JOIN cells c2 ON c2.cid = qs.cid
         |          JOIN embeddings e ON e.vec_id = c2.vec_id AND e.vec_id <> qs.qid)
         |SELECT qid, vid, cos FROM (
         |  SELECT qid, vid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn
         |  FROM cn)
         |WHERE rn <= 5 ORDER BY qid, vid""".stripMargin),

    // MULTI-PROBE IVF — the recall dial of an IVF index: a query searches
    // its nprobe=2 nearest cells by quantized centroid distance instead of
    // only its own (cells are Voronoi regions; a query near a boundary has
    // true neighbors in the adjacent cell — single-probe misses them by
    // construction, and at 100 TB nprobe is the knob traded against scan
    // volume: work is nprobe/k of the corpus per query). Probing scores
    // k=8 centroids per query (broadcast codebook, exact integer
    // distances, ties by cid — all replayed by the oracle from the same
    // CTE chain), then top-5 by exact cosine over the union of the probed
    // inverted lists.
    "q_ann_ivf_probe" -> Q(
      (s, d) => Similarity.ivfTopKProbe(
          Tables.embeddings(s, d), "vec_id", "embedding",
          kmeansFit(s, d), kmeansCents(s, d),
          col("vec_id") < 10, k = 5, nprobe = 2)
        .orderBy("qid", "vid"),
      s"""$kmeansCtes,
         |cells AS (SELECT vec_id, cid FROM a2),
         |qs AS (SELECT vec_id AS qid, v AS qv FROM a2 WHERE vec_id < 10),
         |cd AS (
         |  SELECT qs.qid, c.cid,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> (qs.qv[i] - c.cv[i]) * (qs.qv[i] - c.cv[i]))) AS BIGINT) AS cdist
         |  FROM qs CROSS JOIN c1 c),
         |pr AS (
         |  SELECT qid, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cdist, cid) AS pn
         |    FROM cd)
         |  WHERE pn <= 2),
         |cn AS (
         |  SELECT pr.qid, cl.vec_id AS vid, ${cosSql("qe.embedding", "e.embedding")} AS cos
         |  FROM pr JOIN cells cl ON cl.cid = pr.cid
         |          JOIN embeddings e ON e.vec_id = cl.vec_id AND e.vec_id <> pr.qid
         |          JOIN embeddings qe ON qe.vec_id = pr.qid)
         |SELECT qid, vid, cos FROM (
         |  SELECT qid, vid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn
         |  FROM cn)
         |WHERE rn <= 5 ORDER BY qid, vid""".stripMargin),

    // PRODUCT QUANTIZATION ANN (Jégou et al. 2011 shape): 64-dim vectors
    // split into 4 × 16-dim subspaces, each with its own deterministic
    // integer-lattice k-means codebook (k=8) — a vector compresses to 4
    // byte-sized codes (16× smaller than int8 quantization, the memory
    // form a billion-vector index actually stores). Search is ADC
    // (asymmetric distance computation): per query, a 4×8 distance table
    // of EXACT integer subspace distances (quantized query vs codebook,
    // broadcast), and each vector's approximate distance is the sum of 4
    // table lookups through its codes — no per-vector float math at all.
    // Scale shape: codebooks fit on a sample offline; the scan side moves
    // only (vec_id, 4 codes), the table join is broadcast, and the one
    // exchange is the (qid, vid)-keyed partial-agg'd sum. Everything is
    // integer-exact, so the oracle (4 replayed fits + the same table
    // lookups) matches bit-for-bit with no float tolerance.
    "q_ann_pq" -> Q(
      (s, d) => {
        val m = 4
        val codes = (0 until m).map(i => pqFit(s, d, i)
            .select(col("vec_id"), lit(i).as("s"), col("cid").as("code")))
          .reduce(_.unionByName(_))
        val qv = (0 until m).map(i => pqFit(s, d, i)
            .where(col("vec_id") < 4)
            .select(col("vec_id").as("qid"), lit(i).as("s"), col("v").as("qv")))
          .reduce(_.unionByName(_))
        val cb = (0 until m).map(i => pqCents(s, d, i)
            .select(lit(i).as("s"), col("cid"), col("cv")))
          .reduce(_.unionByName(_))
        val dt = qv.join(broadcast(cb), Seq("s"))
          .select(col("qid"), col("s").as("ds"), col("cid").as("dcid"),
            KMeansQuant.sqDist(col("qv"), col("cv")).as("dist"))
        val adc = codes
          .join(broadcast(dt), col("s") === col("ds") && col("code") === col("dcid"))
          .where(col("vec_id") =!= col("qid"))
          .groupBy(col("qid"), col("vec_id"))
          .agg(sum(col("dist")).as("adc0"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("adc0"), col("vec_id"))
        adc.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
          .select(col("qid"), col("vec_id").as("vid"),
            col("adc0").cast("long").as("adc"))
          .orderBy("qid", "vid")
      },
      s"""$pqCtes,
         |codes AS (
         |  SELECT vec_id, 0 AS s, cid FROM a2_s0 UNION ALL
         |  SELECT vec_id, 1, cid FROM a2_s1 UNION ALL
         |  SELECT vec_id, 2, cid FROM a2_s2 UNION ALL
         |  SELECT vec_id, 3, cid FROM a2_s3),
         |qv AS (
         |  SELECT vec_id AS qid, 0 AS s, v FROM a2_s0 WHERE vec_id < 4 UNION ALL
         |  SELECT vec_id, 1, v FROM a2_s1 WHERE vec_id < 4 UNION ALL
         |  SELECT vec_id, 2, v FROM a2_s2 WHERE vec_id < 4 UNION ALL
         |  SELECT vec_id, 3, v FROM a2_s3 WHERE vec_id < 4),
         |cb AS (
         |  SELECT 0 AS s, cid, cv FROM c1_s0 UNION ALL
         |  SELECT 1, cid, cv FROM c1_s1 UNION ALL
         |  SELECT 2, cid, cv FROM c1_s2 UNION ALL
         |  SELECT 3, cid, cv FROM c1_s3),
         |dt AS (
         |  SELECT qv.qid, qv.s, cb.cid,
         |    CAST(list_sum(list_transform(range(1, 17),
         |      j -> (qv.v[j] - cb.cv[j]) * (qv.v[j] - cb.cv[j]))) AS BIGINT) AS dist
         |  FROM qv JOIN cb USING (s)),
         |adc AS (
         |  SELECT dt.qid, codes.vec_id AS vid, CAST(sum(dt.dist) AS BIGINT) AS adc
         |  FROM codes JOIN dt ON codes.s = dt.s AND codes.cid = dt.cid
         |  WHERE codes.vec_id <> dt.qid
         |  GROUP BY 1, 2)
         |SELECT qid, vid, adc FROM (
         |  SELECT qid, vid, adc,
         |    row_number() OVER (PARTITION BY qid ORDER BY adc, vid) AS rn
         |  FROM adc)
         |WHERE rn <= 5 ORDER BY qid, vid""".stripMargin),

    // ---- text analysis ----
    "q_lang_id" -> Q(
      (s, d) => {
        GraftFunctions.register(s) // langId rides the textFeatures kernel
        Tables.documents(s, d)
          .withColumn("predicted", TA.langId(col("text")))
          .groupBy("lang", "predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "predicted")
      },
      s"""WITH t AS (SELECT lang, $tokSql AS toks, text FROM documents),
         |p AS (SELECT lang,
         |  CASE WHEN regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]') THEN 'zh'
         |       WHEN ${hitsSql("toks", TA.langMarkers("en"))} = 0
         |        AND ${hitsSql("toks", TA.langMarkers("de"))} = 0
         |        AND ${hitsSql("toks", TA.langMarkers("fr"))} = 0
         |        AND ${hitsSql("toks", TA.langMarkers("es"))} = 0 THEN 'und'
         |       WHEN ${hitsSql("toks", TA.langMarkers("en"))} >= ${hitsSql("toks", TA.langMarkers("de"))}
         |        AND ${hitsSql("toks", TA.langMarkers("en"))} >= ${hitsSql("toks", TA.langMarkers("fr"))}
         |        AND ${hitsSql("toks", TA.langMarkers("en"))} >= ${hitsSql("toks", TA.langMarkers("es"))} THEN 'en'
         |       WHEN ${hitsSql("toks", TA.langMarkers("de"))} >= ${hitsSql("toks", TA.langMarkers("fr"))}
         |        AND ${hitsSql("toks", TA.langMarkers("de"))} >= ${hitsSql("toks", TA.langMarkers("es"))} THEN 'de'
         |       WHEN ${hitsSql("toks", TA.langMarkers("fr"))} >= ${hitsSql("toks", TA.langMarkers("es"))} THEN 'fr'
         |       ELSE 'es' END AS predicted
         | FROM t)
         |SELECT lang, predicted, count(*) AS n FROM p
         |GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin),

    "q_text_quality" -> Q(
      (s, d) => TA.qualityFeatures(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id"),
      s"""WITH t AS (SELECT doc_id, text, $tokSql AS toks FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS BIGINT) AS n_punct,
         |  CAST(${hitsSql("toks", TA.langMarkers("en"))} AS BIGINT) AS n_stopwords
         | FROM t)
         |SELECT doc_id, n_chars, n_words, n_punct, n_stopwords,
         |  CASE WHEN n_words > 0 THEN CAST(n_chars - n_words + 1 AS DOUBLE)/n_words ELSE 0.0 END AS avg_word_len,
         |  CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END AS punct_ratio,
         |  CASE WHEN n_words > 0 THEN CAST(n_stopwords AS DOUBLE)/n_words ELSE 0.0 END AS stopword_ratio,
         |  round(least(n_words/100.0, 1.0) * 0.5
         |    + CASE WHEN n_words > 0 THEN least(n_stopwords*10.0/n_words, 1.0) ELSE 0.0 END * 0.3
         |    + (1.0 - CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END) * 0.2,
         |    6) AS quality
         |FROM f ORDER BY doc_id""".stripMargin),

    "q_token_count" -> Q(
      (s, d) => TA.tokenCounts(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id"),
      """SELECT doc_id,
        | CAST(len(list_filter(string_split_regex(text, ' +'), x -> x <> '')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens,
        | CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin),

    "q_fingerprint" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TA.contentFingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin),

    // winnowing fingerprints (k=4 token grams, window w=5), differential
    // oracle: DuckDB rebuilds the md5-60 gram hashes and the per-window
    // minima; the selected VALUE set equals the rightmost-min formulation
    // MOSS-style near-dup candidates from winnowing fingerprints: docs
    // sharing ≥ 5 selected fingerprints (inverted index on the fingerprint
    // value — same join shape as the shingle index, but over the ~1/w
    // winnowed subsample, so the index is a fraction of the full shingle
    // table's size; Schleimer/Wilkerson/Aiken SIGMOD'03)
    "q_winnow_pairs" -> Q(
      (s, d) => {
        val fps = winnowFps(s, d)
        fps.as("a")
          .join(fps.as("b"), col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .groupBy("da", "db")
          .agg(count(lit(1)).as("shared"))
          .where(col("shared") >= 5)
          .orderBy("da", "db")
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |g AS (
         |  SELECT doc_id, i,
         |    ('0x' || substr(md5(array_to_string(t[i:i+3], ' ')), 1, 15))::BIGINT AS gh,
         |    ng
         |  FROM (SELECT doc_id, t, len(t) - 3 AS ng,
         |          unnest(range(1, greatest(len(t) - 3, 0) + 1)) AS i
         |        FROM toks)),
         |win AS (
         |  SELECT doc_id, ng, p, least(p + 4, ng) AS hi
         |  FROM (SELECT doc_id, ng,
         |          unnest(range(1, greatest(ng - 4, 1) + 1)) AS p
         |        FROM (SELECT DISTINCT doc_id, ng FROM g))),
         |wmin AS (
         |  SELECT w.doc_id, w.p, min(g.gh) AS fp
         |  FROM win w JOIN g ON g.doc_id = w.doc_id AND g.i BETWEEN w.p AND w.hi
         |  GROUP BY w.doc_id, w.p),
         |wfp AS (SELECT DISTINCT doc_id, fp FROM wmin)
         |SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
         |FROM wfp a JOIN wfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 5
         |ORDER BY da, db""".stripMargin),

    "q_winnow_fp" -> Q(
      (s, d) => winnowFps(s, d).orderBy("doc_id", "fp"),
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |g AS (
         |  SELECT doc_id, i,
         |    ('0x' || substr(md5(array_to_string(t[i:i+3], ' ')), 1, 15))::BIGINT AS gh,
         |    ng
         |  FROM (SELECT doc_id, t, len(t) - 3 AS ng,
         |          unnest(range(1, greatest(len(t) - 3, 0) + 1)) AS i
         |        FROM toks)),
         |win AS (
         |  SELECT doc_id, ng, p, least(p + 4, ng) AS hi
         |  FROM (SELECT doc_id, ng,
         |          unnest(range(1, greatest(ng - 4, 1) + 1)) AS p
         |        FROM (SELECT DISTINCT doc_id, ng FROM g))),
         |wmin AS (
         |  SELECT w.doc_id, w.p, min(g.gh) AS fp
         |  FROM win w JOIN g ON g.doc_id = w.doc_id AND g.i BETWEEN w.p AND w.hi
         |  GROUP BY w.doc_id, w.p)
         |SELECT DISTINCT doc_id, fp FROM wmin ORDER BY doc_id, fp""".stripMargin),

    // corpus-unigram language-model score: bits/token surprisal under the
    // corpus's own unigram distribution — the classic cheap quality filter
    // (low-probability token soup scores high). One corpus-wide count
    // aggregation (broadcast back), per-doc mean of -log2 p(t).
    "q_lm_score" -> Q(
      (s, d) => {
        val toks = tokStream(s, d).withColumnRenamed("term", "t")
        val uni = toks.groupBy("t").agg(count(lit(1)).cast("double").as("c"))
        val tot = uni.agg(sum(col("c")).as("tt"))
        toks.join(broadcast(uni), "t").crossJoin(broadcast(tot))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(-avg(log(col("c") / col("tt")) / math.log(2.0)), 6)
              .as("lm_bits_per_token"))
          .orderBy("doc_id")
      },
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS t FROM documents),
         |uni AS (SELECT t, count(*)::DOUBLE AS c FROM toks GROUP BY 1),
         |tot AS (SELECT sum(c) AS tt FROM uni)
         |SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |  round(-avg(ln(c / tt) / ln(2)), 6) AS lm_bits_per_token
         |FROM toks JOIN uni USING (t) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // bigram LM surprisal under the corpus's own bigram distribution:
    // P(w|p) = c(p,w)/c(p·) — bits/bigram. Bigrams are built ROW-LOCALLY
    // (transform over the token array, no self-join); two count
    // aggregations, then per-doc mean. Complements the unigram q_lm_score
    // (repetitive token-soup scores low here even when unigrams look fine).
    "q_lm_bigram" -> Q(
      (s, d) => {
        // checkpointed bigram table (shared with q_lm_train): feeds the
        // bigram counts, the prefix counts AND the final per-doc join —
        // without it the tokenize→explode scan runs three times
        val big = bigrams(s, d)
        val cb = big.groupBy("p", "w").agg(count(lit(1)).cast("double").as("cb"))
        val cp = big.groupBy("p").agg(count(lit(1)).cast("double").as("cp"))
        big.join(cb, Seq("p", "w")).join(cp, Seq("p"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            round(-avg(log(col("cb") / col("cp")) / math.log(2.0)), 6)
              .as("bits_per_bigram"))
          .orderBy("doc_id")
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |big AS (
         |  SELECT doc_id, t[i] AS p, t[i+1] AS w
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |        FROM toks WHERE len(t) >= 2)),
         |cb AS (SELECT p, w, count(*)::DOUBLE AS cb FROM big GROUP BY 1, 2),
         |cp AS (SELECT p, count(*)::DOUBLE AS cp FROM big GROUP BY 1)
         |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         |  round(-avg(ln(cb / cp) / ln(2)), 6) AS bits_per_bigram
         |FROM big JOIN cb USING (p, w) JOIN cp USING (p)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // count-based bigram LM TRAINING: the corpus-level conditional
    // probability table P(w|p) = c(p,w)/c(p) — the model the surprisal
    // query consumes, materialized as its own artifact (top 50 by
    // evidence, deterministic ties). Two hash aggregations over the
    // shared checkpointed pair table, join on the prefix — the word-count
    // shape that scales to any corpus; probabilities are single exact
    // integer divisions, bit-equal in any engine. --
    "q_lm_train" -> Q(
      (s, d) => {
        val big = bigrams(s, d)
        val cb = big.groupBy("p", "w").agg(count(lit(1)).as("c_bigram"))
        val cp = big.groupBy("p").agg(count(lit(1)).as("c_prefix"))
        cb.join(cp, "p")
          .select(col("p"), col("w"), col("c_bigram"), col("c_prefix"),
            (col("c_bigram").cast("double") / col("c_prefix")).as("cond_p"))
          .orderBy(col("c_bigram").desc, col("p"), col("w"))
          .limit(50)
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |big AS (
         |  SELECT doc_id, t[i] AS p, t[i+1] AS w
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |        FROM toks WHERE len(t) >= 2)),
         |cb AS (SELECT p, w, count(*)::BIGINT AS c_bigram FROM big GROUP BY 1, 2),
         |cp AS (SELECT p, count(*)::BIGINT AS c_prefix FROM big GROUP BY 1)
         |SELECT p, w, c_bigram, c_prefix,
         |  c_bigram::DOUBLE / c_prefix AS cond_p
         |FROM cb JOIN cp USING (p)
         |ORDER BY c_bigram DESC, p, w LIMIT 50""".stripMargin),

    // PMI collocation mining: bigrams whose joint frequency beats the
    // independence expectation — pmi = ln(n_xy·N / (n_x·n_y)) over the
    // bigram stream (n_x, n_y = first-/second-position marginals), the
    // classic multiword-expression detector ("new york", "machine
    // learning") a tokenizer-vocabulary pass mines before merges. Three
    // hash aggregations over the shared checkpointed pair table; reduce
    // ∝ bigram vocabulary. The evidence gate is the INTEGER n ≥ 5 and
    // the output is TOTALLY ordered by the words themselves, so the one
    // rounded double (pmi, 6 dp, identical op tree both engines: double
    // products THEN one division — int64 n_xy·N would overflow at
    // corpus scale) never decides membership or order. --
    "q_collocations" -> Q(
      (s, d) => {
        val big = bigrams(s, d)
        val cxy = big.groupBy("p", "w").agg(count(lit(1)).as("n"))
        val nx = big.groupBy("p").agg(count(lit(1)).as("nx"))
        val ny = big.groupBy("w").agg(count(lit(1)).as("ny"))
        val tot = big.agg(count(lit(1)).as("nn"))
        cxy.where(col("n") >= 5)
          .join(nx, "p").join(ny, "w").crossJoin(broadcast(tot))
          .select(col("p").as("w1"), col("w").as("w2"), col("n"),
            round(log((col("n").cast("double") * col("nn")) /
              (col("nx").cast("double") * col("ny"))), 6).as("pmi"))
          .orderBy("w1", "w2")
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |big AS (
         |  SELECT doc_id, t[i] AS p, t[i+1] AS w
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |        FROM toks WHERE len(t) >= 2)),
         |cxy AS (SELECT p, w, count(*)::BIGINT AS n FROM big GROUP BY 1, 2),
         |nx AS (SELECT p, count(*)::BIGINT AS nx FROM big GROUP BY 1),
         |ny AS (SELECT w, count(*)::BIGINT AS ny FROM big GROUP BY 1),
         |tot AS (SELECT count(*)::BIGINT AS nn FROM big)
         |SELECT p AS w1, w AS w2, n,
         |  round(ln((n::DOUBLE * nn) / (nx::DOUBLE * ny)), 6) AS pmi
         |FROM cxy JOIN nx USING (p) JOIN ny USING (w) CROSS JOIN tot
         |WHERE n >= 5
         |ORDER BY w1, w2""".stripMargin),

    // int8 embedding quantization (per-vector symmetric scale): emit the
    // scale and the reconstruction MSE via the quantStats kernel — one
    // linear pass per row with the same IEEE op order the oracle's
    // list_reduce replays, so doubles match bit-for-bit. (The earlier
    // expression form inlined the O(d) abs-max into the interpreted
    // aggregate lambda — re-evaluated per element, O(d²) per row and a
    // stable 12.2 s on sf0.1.)
    "q_embed_quant" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        Tables.embeddings(s, d)
          .select(col("vec_id"), quantStats(col("embedding")).as("qs"))
          .select(
            col("vec_id"),
            element_at(col("qs"), 1).as("scale"),
            round(element_at(col("qs"), 2), 9).as("mse"))
          .orderBy("vec_id")
      },
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, v, CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END AS scale
        |  FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM q))
        |SELECT vec_id, scale,
        |  round(list_reduce(list_prepend(0.0, list_transform(v, x ->
        |      CASE WHEN scale > 0
        |           THEN (x - floor(x*scale + 0.5)/scale) * (x - floor(x*scale + 0.5)/scale)
        |           ELSE 0.0 END)),
        |    (a, b) -> a + b) / len(v), 9) AS mse
        |FROM s ORDER BY vec_id""".stripMargin),

    // PCA step 1 (r14): the exact covariance matrix of the embedding table.
    // Vectors quantize to int64 on a 2^20 grid — float·2^20 is a power-of-
    // two scale, so ⌊x·2^20 + 0.5⌋ is EXACT in both engines — and one
    // custom Aggregator (CovAggregator) accumulates [n, Σx_i, Σx_i·x_j]
    // in a single 2145-slot long buffer per partition: the shuffle is
    // O(partitions·d²) longs no matter the corpus, vs O(n·d²) rows for
    // the explode formulation. Covariance then assembles on the driver
    // from ONE bounded buffer (2145 longs) with IEEE-identical doubles —
    // (n·s_ij − s_i·s_j) / (n²·2^40), every operand exact, every op
    // correctly rounded, so the DuckDB replay matches bit-for-bit.
    "q_pca_cov" -> Q(
      (s, d) => {
        import s.implicits._
        val dim = PcaDim
        val buf = pcaCovBuffer(s, d)
        val n = buf(0)
        val rows = for { i <- 0 until dim; j <- i until dim } yield {
          val si = buf(1 + i); val sj = buf(1 + j)
          val sij = buf(1 + dim + i * dim - i * (i - 1) / 2 + (j - i))
          val cov = (n.toDouble * sij.toDouble - si.toDouble * sj.toDouble) /
            (n.toDouble * n.toDouble * 1048576.0 * 1048576.0)
          (i, j, n, si, sj, sij, cov)
        }
        rows.toDF("i", "j", "n", "s_i", "s_j", "s_ij", "cov")
          .orderBy("i", "j")
      },
      s"""WITH $pcaCovSql
        |SELECT i, j, n, s_i, s_j, s_ij, cov FROM covq
        |ORDER BY i, j""".stripMargin),

    // Incremental PCA maintenance (r14): the covariance buffer is a
    // commutative monoid (exact integer adds), so a delta batch updates
    // the statistics WITHOUT rescanning the base — aggregate the delta's
    // 2145-slot buffer, add it slot-wise to the stored one, re-assemble.
    // Here the corpus splits into base (vec_id % 10 != 0) and a "new
    // arrivals" delta (% 10 == 0), each aggregated separately and merged
    // on the driver; integer addition commutes, so the result is
    // BIT-IDENTICAL to the monolithic q_pca_cov (spec-locked), and the
    // oracle is the same full-recompute covariance — the IVM two-path
    // discipline. At 100 TB the nightly job costs |delta|, never |base|.
    "q_pca_incr" -> Q(
      (s, d) => {
        import s.implicits._
        val dim = PcaDim
        def bufOf(df: org.apache.spark.sql.DataFrame): Seq[Long] = df
          .select(transform(col("embedding"),
            x => floor(x.cast("double") * lit(1048576.0) + lit(0.5))
              .cast("long")).as("v"))
          .as[Seq[Long]]
          .select(new graft.functions.CovAggregator(dim).toColumn)
          .head()
        val base = bufOf(Tables.embeddings(s, d).where(col("vec_id") % 10 =!= 0))
        val delta = bufOf(Tables.embeddings(s, d).where(col("vec_id") % 10 === 0))
        val buf = base.zip(delta).map { case (a, b) => a + b }
        val n = buf(0)
        val rows = for { i <- 0 until dim; j <- i until dim } yield {
          val si = buf(1 + i); val sj = buf(1 + j)
          val sij = buf(1 + dim + i * dim - i * (i - 1) / 2 + (j - i))
          val cov = (n.toDouble * sij.toDouble - si.toDouble * sj.toDouble) /
            (n.toDouble * n.toDouble * 1048576.0 * 1048576.0)
          (i, j, n, si, sj, sij, cov)
        }
        rows.toDF("i", "j", "n", "s_i", "s_j", "s_ij", "cov")
          .orderBy("i", "j")
      },
      s"""WITH $pcaCovSql
        |SELECT i, j, n, s_i, s_j, s_ij, cov FROM covq
        |ORDER BY i, j""".stripMargin),

    // PCA step 2 (r14): the top principal component by POWER ITERATION —
    // a fixed 24 steps of v ← C·v / ‖C·v‖ from v₀ = 1/8·𝟙 on the exact
    // covariance assembled above. Every float op is IEEE-correctly-rounded
    // from exact integer inputs and both engines fold the d=64 terms in
    // the SAME index order (Scala while-loop ≡ list_reduce over an
    // index-ordered list_transform), so 24 iterations stay bit-identical
    // and the DuckDB oracle replays the WHOLE algorithm in one recursive
    // CTE — matrix-vector products, L2 normalization, Rayleigh λ = ‖C·v‖.
    // Scale: the distributed cost is the one CovAggregator pass; the
    // iteration is O(d²·T) on a 2145-long driver buffer — constant. --
    "q_pca_power" -> Q(
      (s, d) => {
        import s.implicits._
        val (v, lam) = pcaTopComponent(s, d)
        (0 until PcaDim).map(i => (i, v(i), lam))
          .toDF("i", "raw", "rawl")
          .select(col("i"), round(col("raw"), 9).as("loading"),
            round(col("rawl"), 6).as("eigval"))
          .orderBy("i")
      },
      s"""WITH RECURSIVE $pcaCovSql,
        |$pcaPowerSql,
        |wfin AS (SELECT list_transform(range(1, 65), i2 ->
        |    list_reduce(list_prepend(0.0,
        |      list_transform(range(1, 65), k -> cl.cc[i2][k] * fin.v[k])),
        |      (a, b) -> a + b)) AS w
        |  FROM fin CROSS JOIN cl),
        |lam AS (SELECT sqrt(list_reduce(list_prepend(0.0,
        |    list_transform(w, y -> y * y)), (a, b) -> a + b)) AS l FROM wfin)
        |SELECT x::INTEGER AS i, round(fin.v[x + 1], 9) AS loading,
        |  round(lam.l, 6) AS eigval
        |FROM (SELECT unnest(range(0, 64)) AS x) CROSS JOIN fin CROSS JOIN lam
        |ORDER BY i""".stripMargin),

    // PCA step 3 (r14): project EVERY embedding onto the top component —
    // the distributed consumer of the eigenvector. The raw (unrounded)
    // loading vector becomes a broadcast literal array; the projection is
    // a zero-shuffle ordered fold per row (Spark `aggregate` over
    // `zip_with` ≡ DuckDB `list_reduce` over an index-ordered transform),
    // so the corpus is scanned ONCE with no exchange — at 100 TB this is
    // a pure map regardless of cluster size. --
    "q_pca_project" -> Q(
      (s, d) => {
        val (v, _) = pcaTopComponent(s, d)
        val loading = array(v.map(lit).toIndexedSeq: _*)
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            round(aggregate(
              zip_with(transform(col("embedding"), x => x.cast("double")),
                loading, (x, l) => x * l),
              lit(0.0), (a, c) => a + c), 9).as("pc1"))
          .orderBy("vec_id")
      },
      s"""WITH RECURSIVE $pcaCovSql,
        |$pcaPowerSql
        |SELECT vec_id, round(list_reduce(list_prepend(0.0,
        |    list_transform(range(1, 65),
        |      k -> embedding[k]::DOUBLE * fin.v[k])),
        |  (a, b) -> a + b), 9) AS pc1
        |FROM embeddings CROSS JOIN fin
        |ORDER BY vec_id""".stripMargin),

    // PCA step 4 (r14): the SECOND principal component by Hotelling
    // deflation — C₂ = C − λ₁v₁v₁ᵀ, then the identical 24-step power
    // chain on C₂. Every deflated entry is one subtract of one
    // left-associated product chain (cov − λ·vᵢ·vⱼ), so the second
    // chain's inputs — and therefore all 24 of its iterations — stay
    // bit-identical between the driver and the DuckDB replay, which runs
    // TWO recursive CTEs back to back. Orthogonality v₁·v₂ ≈ 0 is
    // spec-locked. Distributed cost: still the ONE CovAggregator pass. --
    "q_pca_top2" -> Q(
      (s, d) => {
        import s.implicits._
        val c = pcaCovMatrix(s, d)
        val (v1, lam1) = powerIterate(c)
        val dim = PcaDim
        val c2 = Array.tabulate(dim, dim)((i, j) =>
          c(i)(j) - lam1 * v1(i) * v1(j))
        val (v2, lam2) = powerIterateOrtho(c2, v1)
        (0 until dim).map(i => (i, v1(i), v2(i), lam1, lam2))
          .toDF("i", "r1", "r2", "rl1", "rl2")
          .select(col("i"), round(col("r1"), 9).as("l1"),
            round(col("r2"), 9).as("l2"),
            round(col("rl1"), 6).as("e1"), round(col("rl2"), 6).as("e2"))
          .orderBy("i")
      },
      s"""WITH RECURSIVE $pcaCovSql,
        |$pcaPowerSql,
        |w1 AS (SELECT list_transform(range(1, 65), i2 ->
        |    list_reduce(list_prepend(0.0,
        |      list_transform(range(1, 65), k -> cl.cc[i2][k] * fin.v[k])),
        |      (a, b) -> a + b)) AS w
        |  FROM fin CROSS JOIN cl),
        |lam1 AS (SELECT sqrt(list_reduce(list_prepend(0.0,
        |    list_transform(w, y -> y * y)), (a, b) -> a + b)) AS l FROM w1),
        |cm2 AS (SELECT c.i, c.j,
        |    c.cov - lam1.l * fin.v[c.i + 1] * fin.v[c.j + 1] AS cov
        |  FROM cm c CROSS JOIN fin CROSS JOIN lam1),
        |crow2 AS (SELECT i, list(cov ORDER BY j) AS c FROM cm2 GROUP BY i),
        |cl2 AS (SELECT list(c ORDER BY i) AS cc FROM crow2),
        |it2(t, v) AS (
        |  SELECT 0, (SELECT list(0.125::DOUBLE ORDER BY x) FROM
        |             (SELECT unnest(range(0, 64)) AS x))
        |  UNION ALL
        |  SELECT it2.t + 1,
        |    list_transform([
        |      list_transform(range(1, 65), i2 ->
        |        list_reduce(list_prepend(0.0,
        |          list_transform(range(1, 65), k -> cl2.cc[i2][k] * it2.v[k])),
        |          (a, b) -> a + b))],
        |      w -> list_transform([
        |          list_reduce(list_prepend(0.0,
        |            list_transform(range(1, 65), k -> fin.v[k] * w[k])),
        |            (a, b) -> a + b)],
        |        d -> list_transform([
        |            list_transform(range(1, 65), k -> w[k] - d * fin.v[k])],
        |          p -> list_transform(p, y -> y / sqrt(
        |            list_reduce(list_prepend(0.0,
        |              list_transform(p, y2 -> y2 * y2)),
        |              (a, b) -> a + b))))[1])[1])[1]
        |  FROM it2 CROSS JOIN cl2 CROSS JOIN fin WHERE it2.t < 24),
        |fin2 AS (SELECT v FROM it2 WHERE t = 24),
        |w2 AS (SELECT list_transform(range(1, 65), i2 ->
        |    list_reduce(list_prepend(0.0,
        |      list_transform(range(1, 65), k -> cl2.cc[i2][k] * fin2.v[k])),
        |      (a, b) -> a + b)) AS w
        |  FROM fin2 CROSS JOIN cl2),
        |lam2 AS (SELECT sqrt(list_reduce(list_prepend(0.0,
        |    list_transform(w, y -> y * y)), (a, b) -> a + b)) AS l FROM w2)
        |SELECT x::INTEGER AS i, round(fin.v[x + 1], 9) AS l1,
        |  round(fin2.v[x + 1], 9) AS l2,
        |  round(lam1.l, 6) AS e1, round(lam2.l, 6) AS e2
        |FROM (SELECT unnest(range(0, 64)) AS x) CROSS JOIN fin
        |  CROSS JOIN fin2 CROSS JOIN lam1 CROSS JOIN lam2
        |ORDER BY i""".stripMargin),

    // deterministic per-language rate sampling: keep a doc iff
    // md5-60("smp_"+doc_id) mod 1000 < rate(lang)‰ — the scalable sampling
    // method (no RNG state, reproducible on any cluster, stable across
    // reruns), with per-stratum rates like a training-mix recipe. The
    // oracle replays the same md5 arithmetic. (Registered as its own name:
    // r12 review found this entry SHADOWED by the fixed-cap
    // q_sample_stratified lower in this Map literal — last binding wins
    // in a Scala Map — so it had silently dropped out of the registry;
    // RegistrySpec now greps the operator sources for duplicate keys.)
    "q_sample_rate_lang" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val permille = md5Hash60(concat(lit("smp_"), col("doc_id").cast("string"))) % 1000
        val rate = when(col("lang") === "en", 200)
          .when(col("lang") === "zh", 600)
          .when(col("lang").isin("de", "fr", "es"), 400)
          .otherwise(300)
        Tables.documents(s, d)
          .where(permille < rate)
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id")
      },
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5('smp_' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000 <
        |  CASE WHEN lang = 'en' THEN 200 WHEN lang = 'zh' THEN 600
        |       WHEN lang IN ('de','fr','es') THEN 400 ELSE 300 END
        |ORDER BY doc_id""".stripMargin),

    // document chunking for embedding pipelines: 64-token windows with
    // stride 48 (16-token overlap); per-row transform+posexplode, zero
    // shuffle — chunk boundaries are pure integer arithmetic on both
    // engines
    "q_chunk" -> Q(
      (s, d) => TA.chunk(Tables.documents(s, d), "doc_id", "text", 64, 48)
        .orderBy("doc_id", "chunk_ix"),
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |ck AS (
         |  SELECT doc_id, t,
         |    CASE WHEN len(t) > 0
         |         THEN 1 + ((greatest(len(t) - 64, 0) + 47) // 48) ELSE 0 END AS nc
         |  FROM toks)
         |SELECT doc_id, s AS chunk_ix,
         |  len(t[s*48 + 1 : s*48 + 64])::BIGINT AS n_toks,
         |  array_to_string(t[s*48 + 1 : s*48 + 64], ' ') AS chunk
         |FROM (SELECT doc_id, t, unnest(range(0, nc)) AS s FROM ck)
         |ORDER BY doc_id, chunk_ix""".stripMargin),

    // CONTENT-DEFINED chunking (the FastCDC/rsync idea on token streams):
    // a chunk boundary falls wherever the hash of the trailing 8-token
    // window ≡ 0 (mod 16) — so boundaries are decided by LOCAL content,
    // and an insertion early in a document only re-cuts the chunks it
    // touches (fixed-stride q_chunk above re-cuts everything after it;
    // CDC is what makes chunk-hash dedup stable under edits). Expected
    // chunk ≈ 16 tokens; every doc closes with a forced boundary at n.
    // Pure per-row HOF projection + posexplode — zero shuffle; each chunk
    // carries its md5-60 content hash, the dedup join key downstream.
    "q_chunk_cdc" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        TA.cdcChunk(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc_id", "chunk_ix")
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |b AS (
         |  SELECT doc_id, t,
         |    list_sort(list_distinct(list_append(
         |      CASE WHEN len(t) >= 8 THEN
         |        [i FOR i IN range(8, len(t) + 1)
         |         IF ('0x' || substr(md5(array_to_string(array_slice(t, i-7, i), ' ')), 1, 15))::BIGINT % 16 = 0]
         |      ELSE [] END, len(t)))) AS ends
         |  FROM toks WHERE len(t) > 0)
         |SELECT doc_id, j - 1 AS chunk_ix,
         |  (CASE WHEN j = 1 THEN 1 ELSE ends[CAST(j - 1 AS INTEGER)] + 1 END)::BIGINT AS start_tok,
         |  ends[CAST(j AS INTEGER)]::BIGINT AS end_tok,
         |  (ends[CAST(j AS INTEGER)] - (CASE WHEN j = 1 THEN 1 ELSE ends[CAST(j - 1 AS INTEGER)] + 1 END) + 1)::BIGINT AS n_toks,
         |  ('0x' || substr(md5(array_to_string(
         |     array_slice(t, CASE WHEN j = 1 THEN 1 ELSE ends[CAST(j - 1 AS INTEGER)] + 1 END, ends[CAST(j AS INTEGER)]),
         |     ' ')), 1, 15))::BIGINT AS chunk_hash
         |FROM b, UNNEST(range(1, len(ends) + 1)) AS u(j)
         |ORDER BY doc_id, chunk_ix""".stripMargin),

    // token-budget shard packing: within each lang stratum, docs (in id
    // order) pack into ~4096-token shards via a prefix-sum window — the
    // scalable sequence-packing approximation (shard = floor(cum_before /
    // budget), partitioned per stratum so no global single-partition
    // window)
    "q_pack" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), size(tokens(col("text"))).cast("long").as("n_toks"))
          .withColumn("shard_ix",
            floor((sum(col("n_toks")).over(w) - col("n_toks")) / 4096L))
          .orderBy("lang", "doc_id")
      },
      s"""WITH t AS (SELECT doc_id, lang, len($tokSql)::BIGINT AS n_toks FROM documents)
         |SELECT doc_id, lang, n_toks,
         |  ((sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
         |     ROWS UNBOUNDED PRECEDING) - n_toks) // 4096)::BIGINT AS shard_ix
         |FROM t ORDER BY lang, doc_id""".stripMargin),

    // tf-idf top terms per document (keyword extraction): corpus df +
    // per-doc tf, score = tf * ln(N/df), top 3 by (score desc, term) —
    // score is one multiply of identically-derived doubles, so ranking is
    // engine-independent
    "q_tfidf" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val tf = tokStream(s, d)
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        // df as a count window over the term partition instead of a
        // groupBy+join back onto tf: one exchange on term, no join
        // operator, no second aggregation of tf — and nothing
        // vocabulary-sized is ever collected or broadcast, so the shape
        // is scale-safe at a 100 TB corpus (VERDICT r8: the old forced
        // broadcast(dfreq) shipped the whole vocabulary per execution).
        // n stays hinted: a single-row aggregate is bounded at any scale.
        val wdf = Window.partitionBy(col("term"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.withColumn("df", count(lit(1)).over(wdf).cast("double"))
          .crossJoin(broadcast(n))
          .withColumn("score", col("tf") * log(col("n_docs") / col("df")))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select(col("doc_id"), col("rk").cast("long").as("rk"), col("term"),
            round(col("score"), 6).as("score"))
          .orderBy("doc_id", "rk")
      },
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
         |SELECT doc_id, rk, term, score FROM (
         |  SELECT doc_id, term,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tf * ln(n_docs / df) DESC, term) AS rk,
         |    round(tf * ln(n_docs / df), 6) AS score
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin),

    // ---- multimodal plumbing ----
    // ---- deterministic sampling (training-data curation) ----

    // hash-Bernoulli sample: salted md5-60 rank < floor(frac*2^60) — a
    // zero-shuffle scan filter whose row set is identical across runs,
    // engines, task retries and repartitioning (Spark's own sample(seed)
    // is per-partition, so it silently changes with the partitioning).
    // The integer threshold is computed once in Scala and inlined into
    // both engines (double rounding is engine-specific).
    "q_sample_frac" -> Q(
      (s, d) => Sampling.sampleFraction(Tables.documents(s, d), "doc_id", 0.2)
        .select(col("doc_id")).orderBy("doc_id"),
      s"""SELECT doc_id FROM documents
         |WHERE ('0x' || substr(md5('samp_' || doc_id::VARCHAR), 1, 15))::BIGINT
         |      < ${Sampling.threshold(0.2)}
         |ORDER BY doc_id""".stripMargin),

    // stratified cap: up to 5 docs per length bucket by hash rank — the
    // "balance every source/language/length bucket at k docs" curation
    // step; output is k*|strata| regardless of corpus size. The oracle
    // replays bucket, hash, rank and tie-break exactly.
    "q_sample_stratified" -> Q(
      (s, d) => Sampling.stratifiedSample(
          Tables.documents(s, d)
            .select(col("doc_id"), floor(length(col("text")) / 256).as("bucket")),
          "bucket", "doc_id", 5)
        .select(col("bucket"), col("doc_id"),
          col("sample_rank").cast("long").as("sample_rank"))
        .orderBy("bucket", "doc_id"),
      """SELECT bucket, doc_id, sample_rank FROM (
        |  SELECT bucket, doc_id, row_number() OVER (PARTITION BY bucket
        |    ORDER BY ('0x' || substr(md5('samp_' || doc_id::VARCHAR), 1, 15))::BIGINT,
        |             doc_id) AS sample_rank
        |  FROM (SELECT doc_id, length(text) // 256 AS bucket FROM documents))
        |WHERE sample_rank <= 5 ORDER BY bucket, doc_id""".stripMargin),

    // weighted sampling without replacement (see [[Sampling.weightedSample]]):
    // 100 docs drawn with probability ∝ n_chars — the "sample long docs
    // preferentially" curation draw. Priority = md5-60(id)/weight, bottom-k;
    // both engines run the identical int→double conversion + one division,
    // so the winner set (and the priorities) match bit-for-bit.
    "q_sample_weighted" -> Q(
      (s, d) => Sampling.weightedSample(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", 100)
        .orderBy("doc_id"),
      """SELECT doc_id, n_chars, priority FROM (
        |  SELECT doc_id, n_chars,
        |    (('0x' || substr(md5('wsamp_' || doc_id::VARCHAR), 1, 15))::BIGINT)::DOUBLE
        |      / n_chars::DOUBLE AS priority
        |  FROM documents
        |  ORDER BY priority, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin),

    // Zipf rank-frequency fit: the log-log least-squares slope of the
    // corpus's token frequency distribution (a natural-language corpus
    // sits near -1; synthetic/near-uniform text near 0 — a corpus-level
    // quality signal). Scale shape: ONE hash-keyed token count (partial
    // agg), a vocab-sized rank sort (vocab ≪ corpus), then an order-FREE
    // exact reduction: per-type ln() terms are rounded to 9 dp and summed
    // as DECIMAL(28,9) — exact and associative, so Spark's parallel
    // partial aggregation and DuckDB's serial sum agree bit-for-bit. The
    // final slope is a handful of exact decimal ops + one double division.
    "q_zipf" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        GraftFunctions.register(s)
        val d289 = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 9)
        val vocab = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("tok"))
          .groupBy("tok").count()
        val ranked = vocab.withColumn("r",
          row_number().over(Window.orderBy(col("count").desc, col("tok"))))
        val terms = ranked.select(
          round(log(col("r")), 9).cast(d289).as("x"),
          round(log(col("count")), 9).cast(d289).as("y"))
        terms.agg(
            count(lit(1)).as("n_types"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
          .select(col("n_types"),
            round((col("n_types") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n_types") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
              .as("zipf_slope"))
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |v AS (SELECT tok, count(*)::BIGINT AS c
         |      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
         |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM v),
         |terms AS (SELECT round(ln(r::DOUBLE), 9)::DECIMAL(28,9) AS x,
         |                 round(ln(c::DOUBLE), 9)::DECIMAL(28,9) AS y FROM r),
         |agg AS (SELECT count(*)::BIGINT AS n_types, sum(x) AS sx, sum(y) AS sy,
         |          sum(x*y) AS sxy, sum(x*x) AS sxx FROM terms)
         |SELECT n_types,
         |  round(CAST(n_types * sxy - sx * sy AS DOUBLE) /
         |        CAST(n_types * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
         |FROM agg""".stripMargin),

    // blocked fuzzy entity matching: customer-name pairs within the same
    // nation at edit distance ≤ 1, blocked by DELETION NEIGHBORHOOD
    // (FastSS): each name emits itself plus every delete-one-char
    // variant; two names at distance ≤ 1 ALWAYS share a key
    // (substitution → both delete the edited position; insert/delete →
    // the longer's deletion equals the shorter's identity), so recall is
    // exactly 1 while candidate volume is ∝ near-dup density — never
    // block². (The naive nation-block pairing was quadratic in block
    // size: 11.5 s at sf0.1 and ~min² beyond; this shape's exchange
    // moves (len+1)·n short keys and verifies only colliding pairs.)
    "q_entity_match" -> Q(
      (s, d) => {
        // r19: the per-row deletion-variant explode (|name|+1 string
        // builds per customer) is CPU-bound over one parquet split —
        // spread it (the docsSpread discipline)
        val c = Tables.customer(s, d).select(
            col("c_custkey"), col("c_name"), col("c_nationkey"))
          .repartition(s.sessionState.conf.numShufflePartitions)
        val keyed = c.select(col("c_nationkey").as("blk"),
          col("c_custkey"), col("c_name"),
          explode(concat(array(col("c_name")),
            transform(sequence(lit(1), length(col("c_name"))),
              i => concat(col("c_name").substr(lit(1), i - 1),
                col("c_name").substr(i + 1, length(col("c_name"))))))).as("k"))
        val a = keyed.select(col("blk"), col("k"),
          col("c_custkey").as("key_a"), col("c_name").as("name_a"))
        val b = keyed.select(col("blk"), col("k"),
          col("c_custkey").as("key_b"), col("c_name").as("name_b"))
        a.join(b, Seq("blk", "k"))
          .where(col("key_a") < col("key_b"))
          .select(col("blk"), col("key_a"), col("key_b"),
            col("name_a"), col("name_b"))
          .distinct()
          .where(levenshtein(col("name_a"), col("name_b")) <= 1)
          .groupBy(col("blk").as("c_nationkey"))
          .agg(count(lit(1)).as("n_pairs"),
            min(col("key_a")).as("min_key"))
          .orderBy("c_nationkey")
      },
      """SELECT a.c_nationkey, count(*)::BIGINT AS n_pairs,
        |  min(a.c_custkey) AS min_key
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |GROUP BY a.c_nationkey ORDER BY a.c_nationkey""".stripMargin),

    // Jaro-Winkler fuzzy entity scoring — the alignment-based complement
    // to q_entity_match's edit-distance leg (JW rewards shared prefixes
    // and tolerates transpositions, the name-matching workhorse of record
    // linkage). Runs over the DISTINCT part-name vocabulary (dimension-
    // sized by nature — entity resolution pairs within blocks of a
    // bounded entity table, never the corpus), first-letter blocking,
    // scored by the graft_jw codegen kernel. This is a genuine
    // CROSS-ENGINE differential like the levenshtein row: the oracle
    // calls DuckDB's own independent jaro_winkler_similarity; the
    // kernel's exact-rational jaro term and DuckDB's three-division
    // accumulation must agree at round-6 on every pair. --
    "q_entity_match_jw" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val names = Tables.part(s, d).select(col("p_name").as("name")).distinct()
        val a = names.select(col("name").as("name_a"),
          substring(col("name"), 1, 1).as("blk"))
        val b = names.select(col("name").as("name_b"),
          substring(col("name"), 1, 1).as("blk"))
        a.join(b, Seq("blk")).where(col("name_a") < col("name_b"))
          .select(col("name_a"), col("name_b"),
            round(GraftFunctions.jaroWinkler(col("name_a"), col("name_b")), 6)
              .as("jw"))
          .where(col("jw") >= 0.5)
          .orderBy("name_a", "name_b")
      },
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        |FROM names a JOIN names b
        |  ON substr(a.name, 1, 1) = substr(b.name, 1, 1) AND a.name < b.name
        |WHERE round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.5
        |ORDER BY name_a, name_b""".stripMargin),

    // -- edit-distance entity match: the Levenshtein cousin of the JW row
    //    above, using Spark's codegen'd levenshtein() (identical classic
    //    unit-cost DP in both engines — integer result, no tolerance).
    //    Blocking: equi-key on the first character PLUS a length band of
    //    ±4. Only the length band is LOSSLESS (|len(a)−len(b)| lower-
    //    bounds the edit distance); the first-character equi-block is an
    //    APPROXIMATE candidate scheme — a true match whose edit touches
    //    position 0 ('apple'/'bpple', lev 1) is dropped by construction,
    //    the standard recall-for-cost trade every ER blocking key makes.
    //    The oracle mirrors the same block, so the differential certifies
    //    the blocked computation, not full-recall matching. The join
    //    stays a hash join on the block key with the band and the
    //    distance as residual predicates. At 100 TB blocking would move
    //    to (length-bucket × prefix-gram) keys — multi-key blocking that
    //    recovers first-position edits, the same candidate-pruning idea
    //    the PPJoin dedup family already implements. --
    "q_entity_match_lev" -> Q(
      (s, d) => {
        val names = Tables.part(s, d).select(col("p_name").as("name")).distinct()
        val a = names.select(col("name").as("name_a"),
          substring(col("name"), 1, 1).as("blk"))
        val b = names.select(col("name").as("name_b"),
          substring(col("name"), 1, 1).as("blk"))
        a.join(b, Seq("blk")).where(col("name_a") < col("name_b") &&
            abs(length(col("name_a")) - length(col("name_b"))) <= 4)
          .select(col("name_a"), col("name_b"),
            levenshtein(col("name_a"), col("name_b")).cast("long").as("lev"))
          .where(col("lev") <= 4)
          .orderBy("name_a", "name_b")
      },
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev
        |FROM names a JOIN names b
        |  ON substr(a.name, 1, 1) = substr(b.name, 1, 1) AND a.name < b.name
        | AND abs(len(a.name) - len(b.name)) <= 4
        |WHERE levenshtein(a.name, b.name) <= 4
        |ORDER BY name_a, name_b""".stripMargin),

    // df-bounded vocabulary pruning (the CountVectorizer min_df/max_df
    // step): term frequency + document frequency in one exploded scan
    // (tf from all tokens, df from per-doc distinct tokens), pruned to
    // 2 <= df <= 0.5·N. N is a 1-row aggregate cross-joined in
    // (broadcast by construction). Reduce side ∝ vocabulary, not corpus.
    "q_vocab_prune" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val docs = Tables.documents(s, d)
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
        val tf = toks.select(explode(col("t")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("tf"))
        val df = toks.select(col("doc_id"),
            explode(array_distinct(col("t"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("df"))
        tf.join(df, "tok").crossJoin(n)
          .where(col("df") >= 2 && col("df") <= col("n_docs") / 2)
          .select(col("tok"), col("tf"), col("df"))
          .orderBy("tok")
      },
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
         |tf AS (SELECT tok, count(*)::BIGINT AS tf
         |       FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
         |df AS (SELECT tok, count(*)::BIGINT AS df
         |       FROM (SELECT DISTINCT doc_id, unnest(t) AS tok FROM toks)
         |       GROUP BY tok)
         |SELECT tok, tf, df FROM tf JOIN df USING (tok) CROSS JOIN n
         |WHERE df >= 2 AND df <= n_docs // 2 ORDER BY tok""".stripMargin),

    // per-label embedding centroids (mean pooling — the class-prototype /
    // cluster-seed step of an embedding pipeline), kept exact and
    // order-free: each float element is rounded to 9 dp and summed as
    // DECIMAL(28,9) (associative — Spark's parallel partial agg and
    // DuckDB's serial sum agree bit-for-bit), then ONE double division
    // per element. Long-form output (label, pos, centroid): the
    // (label, pos)-keyed aggregation map-side-combines to
    // |labels|·dim rows regardless of corpus size.
    "q_embed_centroid" -> Q(
      (s, d) => {
        val d289 = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 9)
        Tables.embeddings(s, d)
          .select(col("label"), posexplode(col("embedding")))
          .groupBy(col("label"), col("pos").cast("long").as("pos"))
          .agg(sum(round(col("col").cast("double"), 9).cast(d289)).as("sv"),
            count(lit(1)).as("n"))
          .select(col("label"), col("pos"),
            (col("sv").cast("double") / col("n").cast("double")).as("centroid"),
            col("n"))
          .orderBy("label", "pos")
      },
      """SELECT label, u.i - 1 AS pos,
        |  CAST(sum(round(CAST(u.v AS DOUBLE), 9)::DECIMAL(28,9)) AS DOUBLE)
        |    / count(*)::DOUBLE AS centroid,
        |  count(*) AS n
        |FROM (SELECT label, unnest(embedding) AS v,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings) u(label, v, i)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin),

    "q_mm_meta" -> Q(
      (s, d) => Multimodal.withBlob(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("media_meta.mime").as("mime"),
          col("media_meta.n_bytes").as("n_bytes"), col("media_meta.digest").as("digest"))
        .orderBy("doc_id"),
      """SELECT doc_id, 'text/plain' AS mime,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin),

    // deterministic frame sampling (4 frames/payload): offsets, end-of-blob
    // clipping and the per-frame digest all replayed by the oracle over the
    // hex encoding of the same bytes
    "q_mm_frames" -> Q(
      (s, d) => Multimodal.frameSample(
        Multimodal.withBlob(Tables.documents(s, d), "text"), "doc_id", "payload", 4)
        .orderBy("doc_id", "frame_ix"),
      """WITH hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |         octet_length(encode(text))::BIGINT AS nb
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, nb, k.k AS frame_ix,
        |         floor(nb * k.k / 4.0)::BIGINT + 1 AS off
        |  FROM hx CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
        |  WHERE nb > 0)
        |SELECT f.doc_id, f.frame_ix, f.off,
        |  substr(hx.h, ((f.off - 1) * 2 + 1)::INT, 32) AS frame_hex,
        |  md5(substr(hx.h, ((f.off - 1) * 2 + 1)::INT, 32)) AS frame_digest
        |FROM f JOIN hx USING (doc_id)
        |ORDER BY doc_id, frame_ix""".stripMargin),

    // resize planning over the stub-decoded dims: aspect-preserving fit
    // into 64×64, never upscaling — the oracle replays the fake-dim bytes
    // and the scale arithmetic exactly
    "q_mm_resize" -> Q(
      (s, d) => Multimodal.resizePlan(
        Multimodal.withBlob(Tables.documents(s, d), "text"), "doc_id", "payload", 64)
        .orderBy("doc_id"),
      """WITH hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |         octet_length(encode(text))::BIGINT AS nb
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id,
        |    (64 + CASE WHEN nb > 0 THEN ('0x' || substr(h, 1, 2))::BIGINT & 127 ELSE 0 END)::DOUBLE AS w,
        |    (64 + CASE WHEN nb > 1 THEN ('0x' || substr(h, 3, 2))::BIGINT & 127 ELSE 0 END)::DOUBLE AS hh
        |  FROM hx),
        |r AS (SELECT doc_id, w, hh, least(1.0, 64.0 / greatest(w, hh)) AS s FROM dims)
        |SELECT doc_id, w::INT AS src_w, hh::INT AS src_h, round(s, 6) AS scale,
        |  greatest(1, floor(w * s))::INT AS out_w,
        |  greatest(1, floor(hh * s))::INT AS out_h
        |FROM r ORDER BY doc_id""".stripMargin),

    // PII audit: per-document inventory of email / long-digit-run / URL
    // matches — the counting counterpart of q_scrub's masking (audit
    // first, scrub second); per-row regex, zero shuffle
    "q_pii_audit" -> Q(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit("[0-9]{7,}"), lit(0)))
          .cast("long").as("n_long_digit_runs"),
        size(regexp_extract_all(col("text"), lit("https?://[^ ]+"), lit(0)))
          .cast("long").as("n_urls"))
        .orderBy("doc_id"),
      """SELECT doc_id,
        | len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+'))::BIGINT AS n_emails,
        | len(regexp_extract_all(text, '[0-9]{7,}'))::BIGINT AS n_long_digit_runs,
        | len(regexp_extract_all(text, 'https?://[^ ]+'))::BIGINT AS n_urls
        |FROM documents ORDER BY doc_id""".stripMargin),

    // byte-level features over the binary payload, differential oracle:
    // DuckDB explodes the payload's hex pairs into byte values and replays
    // the histogram → distinct count + entropy (identical ln-ratio
    // formula, HALF_UP round to 6) + the stubbed decode dims
    "q_mm_features" -> Q(
      (s, d) => Multimodal.extractFeatures(
        Multimodal.withBlob(Tables.documents(s, d), "text"), "doc_id", "payload")
        .orderBy("doc_id"),
      """WITH hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |         octet_length(encode(text))::BIGINT AS nb
        |  FROM documents),
        |by AS (
        |  SELECT doc_id, nb, unnest(list_transform(range(1, nb::INT + 1),
        |         i -> ('0x' || substr(h, (i-1)*2 + 1, 2))::BIGINT)) AS v
        |  FROM hx),
        |hist AS (SELECT doc_id, nb, v, count(*)::DOUBLE AS c FROM by GROUP BY 1, 2, 3),
        |feat AS (
        |  SELECT doc_id, count(*)::INT AS nd,
        |         round(-sum((c / nb) * (ln(c / nb) / ln(2))), 6) AS ent
        |  FROM hist GROUP BY doc_id, nb)
        |SELECT hx.doc_id, hx.nb AS n_bytes,
        |  coalesce(f.nd, 0)::INT AS n_distinct_bytes,
        |  coalesce(f.ent, 0.0) AS entropy,
        |  (64 + CASE WHEN nb > 0 THEN ('0x' || substr(h, 1, 2))::BIGINT & 127 ELSE 0 END)::INT AS fake_width,
        |  (64 + CASE WHEN nb > 1 THEN ('0x' || substr(h, 3, 2))::BIGINT & 127 ELSE 0 END)::INT AS fake_height
        |FROM hx LEFT JOIN feat f USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    // REAL codec behind the decode splice point: every 3rd doc becomes a
    // byte-exact BMP (little-endian BITMAPINFOHEADER, doc_id-derived dims,
    // every 21st stored top-down via negative height); the JVM kernel
    // parses width/height/bit-depth back from the BYTES while the oracle
    // rebuilds the identical header hex and parses the same fields from
    // hex positions — a differential check of the byte-level parse. Other
    // mimes keep the documented stub dims.
    //
    // Harness-data assumption (ADVICE r4): the engine dispatches on byte
    // magic while the oracle dispatches on doc_id % 3 = 0 — equivalent here
    // only because no harness text/plain payload starts with 'BM' at ≥ 54
    // bytes (the documents corpus is lowercase word soup; 'BM' never
    // occurs). A corpus where it could would need the oracle to sniff the
    // same magic from its synthesized hex. The engine's magic dispatch is
    // the production-correct behavior; the modulus is oracle shorthand.
    // ImageIO round-trip differential: the Spark side ENCODES a solid
    // image with doc_id-derived dims/color per row (ImageIO.write — PNG /
    // JPEG / GIF by id%4; id%4=3 plants VIDEO: a real MJPEG/AVI container
    // when id%8=3 (RIFF walk + avih probe), a real ISO-BMFF box tree when
    // id%16=7 (Mp4Codec big-endian walk, tkhd dims — r12), or an
    // EBML-magic blob when id%16=15 — the deliberate unknown-codec row
    // that keeps the stub FALLBACK exercised), then DECODES it back
    // through the independent reader path (byte-magic dispatch,
    // header-only dim probe, frame-0 pixel decode for lossless codecs).
    // The oracle replays none of the codec work — it predicts
    // codec/width/height/pixel0 purely from doc_id arithmetic, so any
    // defect in either codec path (or the dispatch) hash-mismatches.
    // JPEG (and MJPEG) pixel0 is NULL by contract (lossy); unknown rows
    // report the stub (codec 'stub', dims 0).
    "q_mm_decode_imageio" -> Q(
      (s, d) => {
        val media = Multimodal.synthesizeMedia(
          Tables.documents(s, d).select(col("doc_id")), "doc_id")
        Multimodal.decodeMedia(media, "doc_id", "payload", "mime").orderBy("doc_id")
      },
      """SELECT doc_id,
        |  CASE WHEN doc_id % 8 = 3 THEN 'video/avi'
        |       WHEN doc_id % 16 = 7 THEN 'video/mp4'
        |       WHEN doc_id % 16 = 15 THEN 'video/x-unknown'
        |       WHEN doc_id % 4 = 0 THEN 'image/png'
        |       WHEN doc_id % 4 = 1 THEN 'image/jpeg'
        |       ELSE 'image/gif' END AS mime,
        |  CASE WHEN doc_id % 8 = 3 THEN 'mjpeg'
        |       WHEN doc_id % 16 = 7 THEN 'mp4'
        |       WHEN doc_id % 16 = 15 THEN 'stub'
        |       WHEN doc_id % 4 = 0 THEN 'png'
        |       WHEN doc_id % 4 = 1 THEN 'jpeg'
        |       ELSE 'gif' END AS codec,
        |  (CASE WHEN doc_id % 16 = 15 THEN 0 ELSE 8 + doc_id % 97 END)::INT AS width,
        |  (CASE WHEN doc_id % 16 = 15 THEN 0 ELSE 8 + doc_id % 53 END)::INT AS height,
        |  (CASE WHEN doc_id % 4 IN (0, 2)
        |        THEN (doc_id % 256) * 65536 + ((doc_id // 3) % 256) * 256 + (doc_id // 7) % 256
        |   END)::INT AS pixel0
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Video frame table over the real MJPEG/AVI rows: the container walk
    // splits each AVI into its per-frame JPEGs (aviFrames), each frame
    // decodes through the same ImageIO header probe still images use, and
    // the oracle predicts every field from doc_id arithmetic — frame count
    // 2 + id%4 (also cross-checked against the avih declared count),
    // frame k dims (8+id%97+k) × (8+id%53), fmt_code 2 (= JPEG).
    "q_mm_video" -> Q(
      (s, d) => {
        val media = Multimodal.synthesizeMedia(
          Tables.documents(s, d).select(col("doc_id")), "doc_id")
          .where(col("mime") === "video/avi")
        Multimodal.videoFrames(media, "doc_id", "payload")
          .orderBy("doc_id", "frame_ix")
      },
      """WITH f AS (
        |  SELECT doc_id, unnest(generate_series(0, 1 + doc_id % 4)) AS ix
        |  FROM documents WHERE doc_id % 8 = 3)
        |SELECT doc_id, ix::BIGINT AS frame_ix,
        |  (2 + doc_id % 4)::INT AS declared_frames,
        |  (8 + doc_id % 97 + ix)::INT AS frame_w,
        |  (8 + doc_id % 53)::INT AS frame_h,
        |  2::INT AS fmt_code
        |FROM f ORDER BY doc_id, frame_ix""".stripMargin),

    // MP4 metadata probe over the ISO-BMFF rows: the independent box
    // walk must recover the synthesized tkhd dims, mvhd timescale and
    // duration; the oracle predicts every field from doc_id arithmetic
    // (timescale 600, duration (1+id%240)*600, dims = the shared image
    // formula), so a defect in either the writer's box layout or the
    // reader's offsets hash-mismatches.
    "q_mm_mp4" -> Q(
      (s, d) => {
        import graft.functions.{GraftFunctions => GFF}
        GFF.register(s)
        val media = Multimodal.synthesizeMedia(
          Tables.documents(s, d).select(col("doc_id")), "doc_id")
          .where(col("mime") === "video/mp4")
        media.select(col("doc_id"),
          GFF.mp4Field(col("payload"), 0).as("width"),
          GFF.mp4Field(col("payload"), 1).as("height"),
          GFF.mp4Field(col("payload"), 2).as("timescale"),
          GFF.mp4Field(col("payload"), 3).as("duration"),
          (GFF.mp4Field(col("payload"), 3)
            / GFF.mp4Field(col("payload"), 2)).cast("long").as("duration_s"),
          GFF.mp4Field(col("payload"), 4).as("n_boxes"))
          .orderBy("doc_id")
      },
      """SELECT doc_id, (8 + doc_id % 97)::INT AS width,
        | (8 + doc_id % 53)::INT AS height, 600::INT AS timescale,
        | ((1 + doc_id % 240) * 600)::INT AS duration,
        | (1 + doc_id % 240)::BIGINT AS duration_s,
        | 3::INT AS n_boxes
        |FROM documents WHERE doc_id % 16 = 7 ORDER BY doc_id""".stripMargin),

    // WAV/PCM audio probe — the audio leg of the multimodal surface (see
    // [[graft.functions.AudioCodec]]): real RIFF synthesis AND an
    // independent chunk-walk parse (a planted LIST chunk forces a genuine
    // walk), every field predicted analytically by the oracle — header
    // fields, frame count, truncating duration math, exact integer peak
    // and sum-of-squares (the RMS numerator, bit-for-bit in both
    // engines). Per-row codegen kernels, zero shuffle: a 100 TB audio
    // corpus probes as one embarrassingly-parallel scan.
    "q_mm_audio" -> Q(
      (s, d) => {
        import graft.functions.{GraftFunctions => GFF}
        GFF.register(s)
        Tables.documents(s, d)
          .select(col("doc_id"), GFF.synthWav(col("doc_id")).as("payload"))
          .select(col("doc_id"),
            GFF.wavField(col("payload"), 0).as("sample_rate"),
            GFF.wavField(col("payload"), 1).as("channels"),
            GFF.wavField(col("payload"), 2).as("bits"),
            GFF.wavField(col("payload"), 3).as("n_frames"),
            GFF.wavField(col("payload"), 4).as("duration_ms"),
            GFF.wavField(col("payload"), 5).as("peak"),
            GFF.wavSumSq(col("payload")).as("sum_sq"))
          .withColumn("rms", round(sqrt(col("sum_sq").cast("double") /
            (col("n_frames") * col("channels"))), 6))
          .orderBy("doc_id")
      },
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS rate,
        |    (1 + doc_id % 2)::INT AS channels,
        |    (50 + doc_id % 200)::INT AS frames
        |  FROM documents),
        |sm AS (
        |  SELECT doc_id, ((doc_id*31 + j*17) % 2001) - 1000 AS v
        |  FROM (SELECT doc_id, unnest(range(0, frames*channels)) AS j FROM p)),
        |a AS (SELECT doc_id, max(abs(v))::INT AS peak, sum(v*v)::BIGINT AS sum_sq
        |      FROM sm GROUP BY 1)
        |SELECT p.doc_id, p.rate::INT AS sample_rate, p.channels, 16::INT AS bits,
        |  p.frames AS n_frames, (p.frames * 1000 // p.rate)::INT AS duration_ms,
        |  a.peak, a.sum_sq,
        |  round(sqrt(a.sum_sq::DOUBLE / (p.frames * p.channels)), 6) AS rms
        |FROM p JOIN a USING (doc_id) ORDER BY p.doc_id""".stripMargin),

    // Image near-dedup via perceptual hash — the image leg of the dedup
    // family (Dedup.dhashPairs): synthesize a REAL PNG corpus in groups of
    // three (base + two single-cell edits, PerceptualHash.synthPatternPng,
    // JDK PNG ENCODER), dHash each through the independent ImageIO READER
    // path (decode → 9×8 integer average-pool → 64 comparison bits as two
    // u32 halves), band into four 16-bit blocks (exact for Hamming ≤ 3),
    // verify with bit_count(xor). The oracle replays the WHOLE chain from
    // doc_id arithmetic — per-pixel luminance (the xor-of-primes spatial
    // hash + Knuth avalanche of PerceptualHash.synthPatternPng, +8 on the
    // variant cell), 4×4 cell sums, comparison bits, halves, and the
    // Hamming-≤3 pair set (banding needs no replay: pigeonhole makes it
    // lossless at this threshold, so pairs = all pairs with Hamming ≤ 3)
    // — any defect in the PNG encoder, the decoder, the pooling, or the
    // banding hash-mismatches. Scale: hashing is a zero-shuffle codegen
    // projection; the candidate join is banded, never all-pairs.
    "q_mm_dedup_image" -> Q(
      (s, d) => {
        import graft.functions.{GraftFunctions => GFF}
        GFF.register(s)
        val imgs = spreadDocIds(s, d)
          .select(col("doc_id"), GFF.synthPatternPng(col("doc_id")).as("payload"))
        Dedup.dhashPairs(imgs, "doc_id", "payload").orderBy("da", "db")
      },
      s"""WITH $dhashHashesSql
        |SELECT a.doc_id AS da, b.doc_id AS db,
        |  (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::INT AS hamming
        |FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
        |ORDER BY da, db""".stripMargin),

    // The WIDE-signature scale path of image near-dedup (r15): the 64-bit
    // leg's exact-<=3 banding needs 16-bit bands, whose value space
    // birthday-collides into Theta(n^2/2^16) spurious candidates past
    // ~10^6 images (the failure mode the video x64 rung measured). The
    // 128-bit dHash (9x16 pooled grid, PerceptualHash.dhash128) keeps the
    // same decode and integer pooling but bands as 4x32 bits —
    // pigeonhole-exact for Hamming <= 3 with a 2^32 collision space,
    // candidate-proportional to ~10^9 images. Same synth corpus; the
    // oracle re-pools the identical pixel replay on the finer grid
    // (cells 4x2: x//4, y//2) and packs 4 words. In-group pairs sit <=4
    // bits (one group in ~300 lands at 4 and correctly drops at the <=3
    // threshold — both engines agree), cross-group >=49.
    "q_mm_dedup_image_wide" -> Q(
      (s, d) => {
        import graft.functions.{GraftFunctions => GFF}
        GFF.register(s)
        val sigs = spreadDocIds(s, d)
          .select(col("doc_id"),
            GFF.dhash128(GFF.synthPatternPng(col("doc_id"))).as("dh"))
          .where(size(col("dh")) === 4)
          .select(col("doc_id") +:
            (0 to 3).map(i => element_at(col("dh"), i + 1).as(s"w$i")): _*)
        Dedup.hamming128Pairs(sigs).orderBy("da", "db")
      },
      s"""WITH $dhashPxSql,
        |cells AS (
        |  SELECT doc_id, x // 4 AS cx, y // 2 AS cy, 3 * sum(lum) AS s
        |  FROM px GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.cy, a.cx,
        |         CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND a.cy = b.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8),
        |hashes AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN cy < 4 THEN bit::BIGINT << (cy * 8 + cx)::INT ELSE 0 END) AS w0,
        |    sum(CASE WHEN cy BETWEEN 4 AND 7 THEN bit::BIGINT << ((cy - 4) * 8 + cx)::INT ELSE 0 END) AS w1,
        |    sum(CASE WHEN cy BETWEEN 8 AND 11 THEN bit::BIGINT << ((cy - 8) * 8 + cx)::INT ELSE 0 END) AS w2,
        |    sum(CASE WHEN cy >= 12 THEN bit::BIGINT << ((cy - 12) * 8 + cx)::INT ELSE 0 END) AS w3
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS da, b.doc_id AS db,
        |  (bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
        |   + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3)))::INT AS hamming
        |FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
        |   + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3)) <= 3
        |ORDER BY da, db""".stripMargin),

    // The canonicalization step COMPOSED onto the image near-dup pairs
    // (r14): dHash pairs -> connected components -> every image maps to
    // its cluster's minimum doc_id — the same generic Dedup.dupClusters
    // machinery the text leg uses (q_dedup_clusters), proven to compose
    // across modalities because the pair relation is the shared contract.
    // The oracle replays the ENTIRE chain: pixels -> cells -> bits ->
    // Hamming-<=3 pairs -> recursive-CTE transitive closure.
    "q_mm_dedup_canon" -> Q(
      (s, d) => {
        import graft.functions.{GraftFunctions => GFF}
        GFF.register(s)
        val imgs = spreadDocIds(s, d)
          .select(col("doc_id"), GFF.synthPatternPng(col("doc_id")).as("payload"))
        val pairs = Dedup.dhashPairs(imgs, "doc_id", "payload")
        Dedup.dupClusters(pairs.select(col("da"), col("db"))).orderBy("doc_id")
      },
      s"""WITH RECURSIVE $dhashHashesSql,
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db
        |  FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3),
        |sym AS (SELECT da AS a, db AS b FROM pairs
        |        UNION SELECT db AS a, da AS b FROM pairs),
        |reach AS (
        |  SELECT a AS src, b AS dst FROM sym
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
        |)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin),

    // Audio near-dedup via an acoustic fingerprint — the audio leg of the
    // dedup family, completing the modality set (text / embedding / image /
    // audio). Synthesize a REAL WAV corpus in groups of three (base + two
    // localized loudness edits, AudioCodec.synthWavGroup), fingerprint each
    // through the INDEPENDENT chunk-walk parser (AudioCodec.audioFp: PCM →
    // 65 window energies as exact integers → 64 adjacent-comparison bits as
    // two u32 halves — the chromaprint shape with the transcendental DSP
    // replaced by integer energy so the differential oracle is exact), band
    // into four 16-bit blocks (Dedup.hamming64Pairs, pigeonhole-exact for
    // Hamming ≤ 3 — the SAME candidate machinery as the image leg), verify
    // with bit_count(xor). A one-window edit moves only the two bits
    // adjacent to that window, so base↔variant pairs land at Hamming ≤ 2 by
    // construction while cross-group fingerprints sit near Hamming 32. The
    // oracle replays the WHOLE chain from doc_id arithmetic — samples,
    // window energies, comparison bits, halves, the Hamming-≤3 pair set —
    // so a defect in the WAV writer's chunk layout, the reader's walk, the
    // windowing, or the packing hash-mismatches. Scale: fingerprinting is a
    // zero-shuffle codegen projection; candidates are banded, never
    // all-pairs.
    "q_mm_dedup_audio" -> Q(
      (s, d) => {
        import graft.functions.{GraftFunctions => GFF}
        GFF.register(s)
        val auds = spreadDocIds(s, d)
          .select(col("doc_id"), GFF.synthWavGroup(col("doc_id")).as("payload"))
        val sigs = auds
          .select(col("doc_id"), GFF.audioFp(col("payload")).as("fp"))
          .where(size(col("fp")) === 2)
          .select(col("doc_id"),
            element_at(col("fp"), 1).as("lo"), element_at(col("fp"), 2).as("hi"))
        Dedup.hamming64Pairs(sigs).orderBy("da", "db")
      },
      """WITH sm AS (
        |  SELECT doc_id, j,
        |    (((xor((doc_id // 3) * 73856093, j * 19349663) % 2147483648)
        |       * 2654435761 >> 21) % 2001) - 1000
        |      + CASE WHEN doc_id % 3 > 0 AND j // 8 = 13 * (doc_id % 3)
        |             THEN 100 ELSE 0 END AS v
        |  FROM (SELECT doc_id, unnest(range(0, 520)) AS j FROM documents)),
        |e AS (SELECT doc_id, j // 8 AS w, sum(v * v) AS e FROM sm GROUP BY 1, 2),
        |bits AS (
        |  SELECT a.doc_id, a.w AS i, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
        |  FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.w = a.w + 1
        |  WHERE a.w < 64),
        |hashes AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN i < 32 THEN bit::BIGINT << i::INT ELSE 0 END) AS lo,
        |    sum(CASE WHEN i >= 32 THEN bit::BIGINT << (i - 32)::INT ELSE 0 END) AS hi
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS da, b.doc_id AS db,
        |  (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::INT AS hamming
        |FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
        |ORDER BY da, db""".stripMargin),

    // Video near-dedup — the third multimodal dedup modality (r15,
    // verdict #4), COMPOSING the shipped pieces: VideoCodec's AVI frame
    // walk splits each container into its frame payloads, the
    // PerceptualHash.dhash kernel hashes every frame, and the banded
    // Hamming machinery pairs videos on SUMMED per-frame distance
    // (Dedup.hammingFramePairs — whole-frame-hash bands, pigeonhole-exact
    // for Hamming < frame count; see its doc for why 16-bit blocks
    // birthday-collide at 320 K videos). Corpus: synthAviGroup — AVIs
    // whose 4 frame chunks carry synthPatternPng-style PNGs (lossless, so
    // the oracle replays the ENTIRE chain from doc_id arithmetic: per-
    // frame pixels -> 4x4 cell sums -> comparison bits -> u32 halves ->
    // summed aligned-frame Hamming -> pair set); variant k edits one cell
    // of frame k only, a single-frame local edit. Scale: split+decode+
    // hash is one zero-shuffle codegen projection fanning 4 frames/video;
    // candidates are banded and verify is candidate-proportional — never
    // all-pairs.
    "q_mm_dedup_video" -> Q(
      (s, d) => Dedup.hammingFramePairs(videoSigs(s, d)).orderBy("da", "db"),
      s"""WITH $videoHashesSql
        |SELECT a.doc_id AS da, b.doc_id AS db,
        |  sum(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::INT AS hamming
        |FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id AND a.f = b.f
        |GROUP BY 1, 2
        |HAVING sum(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))) <= 3
        |ORDER BY da, db""".stripMargin),

    // The canonicalization step COMPOSED onto the VIDEO near-dup pairs
    // (r15): frame-hash-banded pairs -> connected components -> min-id
    // representative — the third modality through the same generic
    // Dedup.dupClusters machinery (text q_dedup_clusters, image
    // q_mm_dedup_canon), proving the pair relation is the shared
    // composition contract across every dedup leg. Oracle: the video
    // pixel replay extended with a recursive-CTE transitive closure.
    "q_mm_dedup_video_canon" -> Q(
      (s, d) => {
        val pairs = Dedup.hammingFramePairs(videoSigs(s, d))
        Dedup.dupClusters(pairs.select(col("da"), col("db"))).orderBy("doc_id")
      },
      s"""WITH RECURSIVE $videoHashesSql,
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db
        |  FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id AND a.f = b.f
        |  GROUP BY 1, 2
        |  HAVING sum(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))) <= 3),
        |sym AS (SELECT da AS a, db AS b FROM pairs
        |        UNION SELECT db AS a, da AS b FROM pairs),
        |reach AS (
        |  SELECT a AS src, b AS dst FROM sym
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
        |)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin),

    "q_mm_decode" -> Q(
      (s, d) => {
        val media = Multimodal.synthesizeBmp(Tables.documents(s, d), "doc_id", "text")
        Multimodal.decode(media, "doc_id", "payload", "mime").orderBy("doc_id")
      },
      """WITH base AS (
        |  SELECT doc_id, hex(encode(text)) AS th,
        |         octet_length(encode(text))::BIGINT AS nb
        |  FROM documents),
        |parm AS (
        |  SELECT doc_id, th, nb, doc_id % 3 = 0 AS is_bmp,
        |    16 + doc_id % 497 AS w,
        |    CASE WHEN doc_id % 21 = 0 THEN -(16 + doc_id % 293)
        |         ELSE 16 + doc_id % 293 END AS hf,
        |    CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 8 END AS bpp
        |  FROM base),
        |hx AS (
        |  SELECT doc_id, th, nb, is_bmp,
        |    upper(printf('%08x', 54 + nb)) AS xs,
        |    upper(printf('%08x', w)) AS xw,
        |    upper(printf('%08x', (4294967296 + hf) % 4294967296)) AS xh,
        |    upper(printf('%04x', bpp)) AS xb
        |  FROM parm),
        |fhx AS (
        |  SELECT doc_id, th, nb, is_bmp,
        |    '424D' || substr(xs,7,2)||substr(xs,5,2)||substr(xs,3,2)||substr(xs,1,2)
        |    || '0000000036000000' || '28000000'
        |    || substr(xw,7,2)||substr(xw,5,2)||substr(xw,3,2)||substr(xw,1,2)
        |    || substr(xh,7,2)||substr(xh,5,2)||substr(xh,3,2)||substr(xh,1,2)
        |    || '0100' || substr(xb,3,2)||substr(xb,1,2)
        |    || repeat('0', 48) || th AS fh
        |  FROM hx),
        |parsed AS (
        |  SELECT doc_id, th, nb, is_bmp,
        |    ('0x'||substr(fh,43,2)||substr(fh,41,2)||substr(fh,39,2)||substr(fh,37,2))::BIGINT AS wp,
        |    ('0x'||substr(fh,51,2)||substr(fh,49,2)||substr(fh,47,2)||substr(fh,45,2))::BIGINT AS hpu,
        |    ('0x'||substr(fh,59,2)||substr(fh,57,2))::BIGINT AS bp,
        |    length(fh)::BIGINT // 2 AS full_bytes
        |  FROM fhx),
        |sgn AS (
        |  SELECT *, CASE WHEN hpu >= 2147483648 THEN hpu - 4294967296 ELSE hpu END AS hs
        |  FROM parsed)
        |SELECT doc_id,
        |  CASE WHEN is_bmp THEN 'image/bmp' ELSE 'text/plain' END AS mime,
        |  CASE WHEN is_bmp THEN 'bmp' ELSE 'stub' END AS codec,
        |  CASE WHEN is_bmp THEN wp
        |       ELSE 64 + CASE WHEN nb > 0 THEN ('0x'||substr(th,1,2))::BIGINT & 127 ELSE 0 END
        |  END::INT AS width,
        |  CASE WHEN is_bmp THEN abs(hs)
        |       ELSE 64 + CASE WHEN nb > 1 THEN ('0x'||substr(th,3,2))::BIGINT & 127 ELSE 0 END
        |  END::INT AS height,
        |  CASE WHEN is_bmp THEN hs < 0 ELSE false END AS top_down,
        |  CASE WHEN is_bmp THEN bp ELSE 0 END::INT AS bit_depth,
        |  CASE WHEN is_bmp THEN (54 + nb) > full_bytes ELSE false END AS truncated,
        |  CASE WHEN is_bmp THEN full_bytes ELSE nb END AS n_bytes
        |FROM sgn ORDER BY doc_id""".stripMargin)
  )
}
