package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row similarity/sketch kernels, written against Spark's internal row
  * formats (`UTF8String`, `ArrayData`) so they are zero-copy and invoked via
  * `StaticInvoke` — i.e. they stay inside whole-stage codegen, unlike a
  * Scala UDF which forces serialization to external types.
  *
  * The reference engine's only kernel family is the typed comparison scan
  * (`/root/reference/src/lazy.frame.c:315-406`); these are the extension
  * kernels a training-data pipeline needs (dedup sketches, similarity).
  *
  * All hashing is xxhash64 (Spark's own `XXH64`), so signatures are
  * deterministic across JVMs, partitions and executors.
  */
object TextHashes {

  private val Seed1 = 0x9747b28cL
  private val Seed2 = 0x41c64e6dL

  @inline private def xx(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** MinHash signature of a shingle set (multiplicity-insensitive).
    *
    * Uses the Kirsch-Mitzenmacher construction h_i = h1 + i*h2: two xxhash64
    * evaluations per shingle generate all `numHashes` hash functions, so the
    * cost is O(shingles * numHashes) cheap arithmetic, not O(...) hashing.
    * An empty shingle array yields an all-Long.MaxValue signature.
    */
  def minhash(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val h1 = xx(s, Seed1)
        val h2 = xx(s, Seed2)
        var j = 0
        var h = h1
        while (j < numHashes) {
          if (h < sig(j)) sig(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over a token array (weight 1 per occurrence): bit b of
    * the result is set iff the sum of ±1 votes from token-hash bit b is
    * positive. Near-identical documents differ in few bits (small Hamming
    * distance — compare with Spark's built-in `bit_count(a ^ b)`). */
  def simhash(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = xx(tokens.getUTF8String(i), Seed1)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * hash every k-token gram, slide a window of `w` gram-hashes, keep the
    * rightmost minimum of each window; return the distinct selected hashes,
    * sorted. Robust to small edits: unchanged regions keep their
    * fingerprints. */
  def winnow(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      // rolling-style combine of the k token hashes
      var h = 0L
      var j = 0
      while (j < k) {
        val t = if (tokens.isNullAt(i + j)) 0L else xx(tokens.getUTF8String(i + j), Seed1)
        h = h * 0x100000001b3L + t
        j += 1
      }
      grams(i) = h
      i += 1
    }
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    if (nGrams <= w) {
      var m = grams(0); i = 1
      while (i < nGrams) { if (grams(i) <= m) m = grams(i); i += 1 }
      selected += m
    } else {
      var start = 0
      while (start + w <= nGrams) {
        var m = grams(start)
        var mi = start
        var j = start + 1
        while (j < start + w) {
          if (grams(j) <= m) { m = grams(j); mi = j } // rightmost min
          j += 1
        }
        selected += grams(mi)
        start += 1
      }
    }
    new GenericArrayData(selected.toArray)
  }

  /** Cosine similarity of two float vectors, accumulated sequentially in
    * double (deterministic: same order ⇒ bit-identical across engines). */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random-hyperplane LSH bucket: `bits` sign-bits of dot products with
    * pseudo-random ±1 hyperplanes. Plane component (table, j, i) is the low
    * bit of xxhash64 of the packed indices — deterministic everywhere, no
    * RNG state to ship to executors. */
  def hyperplaneBucket(v: ArrayData, table: Int, bits: Int): Int = {
    val d = v.numElements()
    var bucket = 0
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      val base = (table.toLong * 4099L + j.toLong) * 1000003L
      while (i < d) {
        val h = XXH64.hashLong(base + i, Seed1)
        val sign = if ((h & 1L) == 1L) 1.0 else -1.0
        dot += sign * v.getFloat(i)
        i += 1
      }
      if (dot > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  /** Dot product of two float vectors (double accumulation). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  // ---------------------------------------------------------------------
  // md5-derived kernels: every hash below is the first 60 bits of the md5
  // of a string, i.e. exactly `('0x' || substr(md5(s), 1, 15))::BIGINT` in
  // ANSI-ish SQL. That choice makes each WHOLE ALGORITHM (simhash,
  // winnowing, hyperplane LSH) reproducible by the DuckDB oracle — the
  // differential harness then verifies the pipeline itself, not merely an
  // aggregate bound. xxhash64 variants above remain the faster kernels
  // when cross-engine reproducibility isn't needed.
  // ---------------------------------------------------------------------

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) == big-endian first 8 digest bytes >>> 4
    * == `('0x' || substr(md5(s),1,15))::BIGINT`. Always non-negative. */
  @inline private def md5Bits60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** md5-60 hash of a UTF8 string column value. */
  def md5Hash60(s: UTF8String): Long = md5Bits60(s.getBytes)

  /** 60-bit SimHash over a token array (weight 1 per occurrence), with the
    * md5-60 token hash: bit b set iff Σ ±1 votes from token-hash bit b is
    * positive. DuckDB reproduces it with md5 + bit arithmetic. */
  def simhash60(tokens: ArrayData): Long = {
    val acc = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Hash60(tokens.getUTF8String(i))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03) over
    * md5-60 hashes of k-token grams (space-joined, like [[shingles]]):
    * slide a window of `w` gram-hashes, keep each window's minimum; return
    * the distinct selected hashes sorted. The selected VALUE set equals
    * the rightmost-min formulation (ties share the value), and every step
    * is plain SQL: grams → md5-60 → windowed min → distinct. */
  /** md5-60 of every k-gram (space-joined) of a token array, positional
    * order — shared by [[winnow60]] and the [[gramHashes60]] kernel. */
  private def gramHash60Array(tokens: ArrayData, k: Int): Array[Long] = {
    val n = tokens.numElements()
    val nGrams = n - k + 1
    if (nGrams <= 0) return Array.emptyLongArray
    val grams = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        if (!tokens.isNullAt(i + j)) sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      grams(i) = md5Bits60(sb.toString.getBytes("UTF-8"))
      i += 1
    }
    grams
  }

  /** StaticInvoke kernel: ascending per-type occurrence counts of a token
    * array (sort tokens binary, run-length the runs, sort the counts) —
    * the input the Shannon-entropy fold wants. SQL twin:
    * `list_sort(run-length counts of list_sort(t))`; UTF8String.compareTo
    * is binary like DuckDB's default collation, and the count MULTISET is
    * collation-independent anyway.
    *
    * Exists because the pure-expression formulation (array_sort +
    * element_at over filter(sequence) over a sorted copy) INLINES every
    * intermediate into one interpreted expression tree — each element
    * access re-evaluates the inner sort, a combinatorial blow-up that put
    * one sf0.1 q_entropy task at 30+ CPU-minutes (r13; count()-pruned
    * benches had hidden it). This loop is O(n log n) per row, flat. */
  def sortedRunCounts(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val arr = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      arr(i) = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8
               else tokens.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(arr, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val counts = new java.util.ArrayList[Long](16)
    var runStart = 0
    i = 1
    while (i <= n) {
      if (i == n || arr(i).compareTo(arr(runStart)) != 0) {
        counts.add((i - runStart).toLong); runStart = i
      }
      i += 1
    }
    val out = new Array[Long](counts.size)
    i = 0
    while (i < out.length) { out(i) = counts.get(i); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** StaticInvoke kernel: positional k-gram md5-60 hash array. The codegen
    * replacement for `transform(shingles(t, k), g -> md5Hash60(g))`: the
    * interpreted HOF chain (transform + slice + concat_ws per gram) costs
    * ~3.0 s per sf0.1 corpus pass vs ~0.2 s for this loop — the hashing
    * was never the expensive part, the per-gram expression interpretation
    * was. Element i covers tokens [i, i+k-1] (0-based), exactly the
    * positional contract span-decontamination needs. */
  def gramHashes60(tokens: ArrayData, k: Int): ArrayData =
    new GenericArrayData(gramHash60Array(tokens, k))

  /** StaticInvoke kernel: content-defined-chunking boundary positions.
    * A boundary falls after 1-based token i (win ≤ i ≤ n) wherever the
    * md5-60 of the trailing `win`-token window (space-joined — the same
    * gram contract as [[gramHashes60]]) ≡ 0 (mod mask); the doc always
    * force-closes at n, emitted once even when n is itself a boundary.
    * Output is ascending by construction — no sort/distinct pass.
    *
    * Exists for the same reason as [[sortedRunCounts]]: the pure-HOF
    * formulation (filter(sequence) with slice + concat_ws + md5 per
    * position) is interpreted per element and put q_chunk_cdc at 10.3 s
    * for a QUIET sf0.1 leg (r13c ladder x1, gc 242 ms — intrinsic, not
    * noise) where every sibling per-row operator runs ≤ 2 s. One tight
    * loop over the shared gram-hash array is the codegen shape. */
  def cdcEnds(tokens: ArrayData, win: Int, mask: Int): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyIntArray)
    val grams = gramHash60Array(tokens, win) // index g covers tokens [g+1, g+win]
    val ends = new java.util.ArrayList[Integer](16)
    var g = 0
    while (g < grams.length) {
      if (grams(g) % mask == 0) ends.add(g + win) // boundary AFTER token g+win
      g += 1
    }
    if (ends.isEmpty || ends.get(ends.size - 1) != n) ends.add(n)
    val out = new Array[Int](ends.size)
    var i = 0
    while (i < out.length) { out(i) = ends.get(i); i += 1 }
    new GenericArrayData(out)
  }

  /** StaticInvoke kernel: per-vector symmetric int8 quantization stats —
    * returns [scale, mse] for a float vector, with the EXACT IEEE op
    * order the SQL oracle replays (abs-max in element order, scale =
    * 127.0/max, per-element dq = floor(x·scale + 0.5)/scale, squared
    * errors summed by an in-order fold from 0.0, one division by n).
    *
    * Exists because the expression formulation inlined `scale` — itself
    * an O(d) array_max over a transformed copy — into the interpreted
    * aggregate lambda, re-evaluating it (and the cast array) per
    * element: O(d²) per row with two array allocations per step, a
    * stable 12.2 s on sf0.1 (leg-2 full bench) for what is one linear
    * pass. */
  def quantStats(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    if (n == 0) return new GenericArrayData(Array(0.0, 0.0))
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = java.lang.Math.abs(vec.getFloat(i).toDouble)
      if (a > mx) mx = a
      i += 1
    }
    val scale = if (mx > 0) 127.0 / mx else 0.0
    var acc = 0.0
    i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble
      if (scale > 0) {
        val dq = java.lang.Math.floor(x * scale + 0.5) / scale
        acc += (x - dq) * (x - dq)
      }
      i += 1
    }
    new GenericArrayData(Array(scale, acc / n))
  }

  /** StaticInvoke kernel: hashed-feature linear fold Σ_h lam[h mod |lam|]
    * — the scoring pass of a hashed bag-of-features model (DSIR importance
    * weights and kin). `lam` is a foldable literal in the plan (the fitted
    * per-bucket log-ratios), so the whole score is one tight per-row loop
    * in codegen with zero allocation and zero shuffle. */
  def bucketFold(hashes: ArrayData, lam: ArrayData): Double = {
    val m = lam.numElements()
    if (m == 0) return 0.0
    var acc = 0.0
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      acc += lam.getDouble(java.lang.Math.floorMod(hashes.getLong(i), m.toLong).toInt)
      i += 1
    }
    acc
  }

  def winnow60(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val grams = gramHash60Array(tokens, k)
    val nGrams = grams.length
    if (nGrams == 0) return new GenericArrayData(Array.emptyLongArray)
    var i = 0
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    if (nGrams <= w) {
      var m = grams(0); i = 1
      while (i < nGrams) { if (grams(i) < m) m = grams(i); i += 1 }
      selected += m
    } else {
      var start = 0
      while (start + w <= nGrams) {
        var m = grams(start)
        var j = start + 1
        while (j < start + w) { if (grams(j) < m) m = grams(j); j += 1 }
        selected += m
        start += 1
      }
    }
    new GenericArrayData(selected.toArray)
  }

  /** ±1 hyperplane components derived from md5 of "t_j_i" (low bit of the
    * first hex nibble) — reproducible in SQL. The full plane set for a
    * given (tables, bits, dim) is memoized per JVM: the space is tiny and
    * fixed, so executors pay the md5 cost once, not per row. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Byte]]]()

  private def planes(tables: Int, bits: Int, d: Int): Array[Array[Byte]] =
    planeCache.computeIfAbsent((tables, bits, d), { _ =>
      Array.tabulate(tables * bits) { tj =>
        val t = tj / bits
        val j = tj % bits
        Array.tabulate(d) { i =>
          val h = md5Bits60(s"${t}_${j}_${i}".getBytes("UTF-8"))
          // first hex nibble of the digest = bits 59..56 of md5Bits60
          if (((h >>> 56) & 1L) == 1L) 1.toByte else -1.toByte
        }
      }
    })

  /** Random-hyperplane LSH bucket with md5-derived planes: `bits` sign
    * bits of dot products, bit j set iff dot(v, plane(table, j)) > 0. */
  def hyperplaneBucketMd5(v: ArrayData, table: Int, bits: Int): Int = {
    val d = v.numElements()
    val pl = planes(table + 1, bits, d) // ensure cache covers tables 0..table
    var bucket = 0
    var j = 0
    while (j < bits) {
      val p = pl(table * bits + j)
      var dot = 0.0
      var i = 0
      while (i < d) { dot += p(i) * v.getFloat(i).toDouble; i += 1 }
      if (dot > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  /** Signed (±1) random-projection planes, md5-derived ("rp_j_i" keys — a
    * salt space disjoint from the LSH planes' "t_j_i"), cached per (r, d). */
  private val projPlaneCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Byte]]]

  private def projPlanes(r: Int, d: Int): Array[Array[Byte]] =
    projPlaneCache.computeIfAbsent((r, d), { _ =>
      Array.tabulate(r) { j =>
        Array.tabulate(d) { i =>
          val h = md5Bits60(s"rp_${j}_${i}".getBytes("UTF-8"))
          if (((h >>> 56) & 1L) == 1L) 1.toByte else -1.toByte
        }
      }
    })

  /** StaticInvoke kernel: signed random projection R^d → R^r (the ±1
    * Achlioptas/JL construction): out_j = Σ_i sign(j,i)·v_i, accumulated
    * sequentially in double so the SQL oracle's ordered list_sum replay
    * is bit-identical. Cosine in the projected space approximates cosine
    * in the original within the JL distortion, at r/d the scan width. */
  def randProject(v: ArrayData, r: Int): ArrayData = {
    val d = v.numElements()
    val pl = projPlanes(r, d)
    val out = new Array[Double](r)
    var j = 0
    while (j < r) {
      val p = pl(j)
      var dot = 0.0
      var i = 0
      while (i < d) { dot += p(i) * v.getFloat(i).toDouble; i += 1 }
      out(j) = dot
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine over double vectors (the projected space) — same sequential
    * accumulation contract as [[cosineF]]. */
  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** StaticInvoke kernel: first significant decimal digit of a positive
    * int64 — a handful of integer divisions inside whole-stage codegen,
    * no per-row string allocation, and exact at every power-of-ten
    * boundary (float log10 is off by an ulp exactly there). Non-positive
    * input returns 0 (callers filter it out). */
  def firstDigit(v: Long): Long = {
    var x = v
    if (x <= 0L) return 0L
    while (x >= 10L) x /= 10L
    x
  }

  // ---- byte-level multimodal features (binary payload column) ----

  /** Shannon entropy (bits/byte) of a byte histogram, summed over byte
    * values ascending, rounded HALF_UP to 6 decimals — matching
    * `round(-sum(p*ln(p)/ln(2)), 6)` over the same histogram in SQL. */
  def byteEntropy(bytes: Array[Byte]): Double = {
    val n = bytes.length
    if (n == 0) return 0.0
    val hist = new Array[Long](256)
    var i = 0
    while (i < n) { hist(bytes(i) & 0xFF) += 1; i += 1 }
    var e = 0.0
    var b = 0
    while (b < 256) {
      if (hist(b) > 0) {
        val p = hist(b).toDouble / n
        e -= p * (math.log(p) / math.log(2))
      }
      b += 1
    }
    BigDecimal(e).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Count of distinct byte values in the payload. */
  def distinctBytes(bytes: Array[Byte]): Int = {
    val seen = new Array[Boolean](256)
    var c = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (!seen(b)) { seen(b) = true; c += 1 }
      i += 1
    }
    c
  }

  /** Pseudo decode dimension: 64 + (byte[idx] & 0x7F), 64 when absent —
    * the STUB stand-in for a real media decoder (no codecs in container). */
  def fakeDim(bytes: Array[Byte], idx: Int): Int =
    64 + (if (bytes.length > idx) bytes(idx) & 0x7F else 0)

  /** Real BMP header decode — the first concrete codec behind the decode
    * splice point (pure JVM, no codec libs needed: BITMAPINFOHEADER is a
    * fixed little-endian layout). `which`: 0 = biWidth (signed int32 LE at
    * byte 18), 1 = biHeight (signed int32 LE at 22; NEGATIVE means a
    * top-down pixel order per the spec — returned raw), 2 = biBitCount
    * (uint16 LE at 28), 3 = bfSize (uint32 LE at 2 — the DECLARED total
    * file size; reinterpret the raw bits as unsigned before comparing to
    * the actual payload length: a declared size exceeding the bytes on
    * hand means a truncated/corrupt file whose header dims can't be
    * trusted). Returns [[NOT_BMP]] when the payload lacks the 'BM' magic
    * or a full 54-byte header — callers fall back to the stub for other
    * mimes. */
  final val NOT_BMP: Int = Int.MinValue

  def bmpField(bytes: Array[Byte], which: Int): Int = {
    if (bytes.length < 54 || bytes(0) != 0x42 || bytes(1) != 0x4D) return NOT_BMP
    def le32(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
        ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)
    which match {
      case 0 => le32(18)
      case 1 => le32(22)
      case 2 => (bytes(28) & 0xFF) | ((bytes(29) & 0xFF) << 8)
      case 3 => le32(2)
      case _ => NOT_BMP
    }
  }

  /** Unicode NFC normalization (canonical composition) — the hygiene pass a
    * text pipeline runs BEFORE any hashing/dedup step, because the same
    * visible string has multiple byte encodings (e + U+0301 vs é) and every
    * downstream digest/shingle/minhash treats them as different documents.
    * `java.text.Normalizer` implements UAX #15 NFC, the same algorithm
    * DuckDB's `nfc_normalize` (utf8proc) implements, so the oracle compares
    * normalized bytes directly — FOR CODE POINTS BOTH ENGINES' Unicode
    * tables cover (ADVICE r15: a JDK vs utf8proc Unicode-VERSION skew can
    * compose differently for code points added in newer Unicode versions;
    * the bit-parity claim is scoped to the shared version, and
    * TextHashesSpec runs a differential corpus over combining marks from
    * several Unicode eras to detect a skew in this toolchain). Fast path:
    * a pure-ASCII string
    * is already NFC (scan bytes, no allocation) — the overwhelmingly common
    * case in a web corpus, and the reason this beats normalizing
    * unconditionally through String round-trips. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0L
    var ascii = true
    while (ascii && i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }

  /** Jaro-Winkler similarity — the alignment-based fuzzy-match score Spark
    * has no built-in for (only levenshtein/soundex). Standard Winkler
    * variant, matched to DuckDB's independent implementation so the two
    * engines cross-check each other: match window ⌊max(|a|,|b|)/2⌋ − 1,
    * greedy left-to-right matching, transpositions = misordered matched
    * chars / 2, prefix boost l·0.1·(1 − jaro) for l ≤ 4 applied only when
    * jaro exceeds the 0.7 boost threshold, either empty string → 0
    * (probed: jaro_winkler_similarity('','') = 0, not 1).
    *
    * The jaro term REPLAYS DuckDB's (RapidFuzz-derived) float op order
    * exactly — (m/|a| + m/|b| + (m−⌊t/2⌋)/m) / 3, left-associated — NOT a
    * single exact-rational division: the boost THRESHOLD is a branch on
    * the float value, and the harness corpus really does contain pairs
    * whose true jaro is exactly 7/10 ("hot gizmo"/"hot widget": the
    * correctly-rounded single division lands BELOW the 0.7 literal while
    * DuckDB's three-division accumulation lands above, flipping the
    * boost — caught by the oracle gate on first contact, not
    * hypothetical). With the op order pinned, every step is an IEEE
    * correctly-rounded +, /, * of exact integer-valued operands, so the
    * two engines agree bit-for-bit, branch included. Transpositions use
    * integer halving (probed: 'abcdef'/'bcadef', traw = 3 → t = 1) and
    * the prefix boost applies at any length (probed: 'abc'/'abd').
    * Comparison is by UTF-16 code unit (≡ codepoint on the BMP; the
    * harness corpus is ASCII — same scope note as [[nfc]]). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val matchedB = new Array[Boolean](lb)
    val matchA = new Array[Int](math.min(la, lb))
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + w)
      var j = math.max(0, i - w)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!matchedB(j) && s.charAt(i) == t.charAt(j)) {
          matchedB(j) = true
          matchA(m) = i
          m += 1
          unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var traw = 0
    var jj = 0
    var k = 0
    while (k < m) {
      while (!matchedB(jj)) jj += 1
      if (s.charAt(matchA(k)) != t.charAt(jj)) traw += 1
      jj += 1
      k += 1
    }
    val halfT = traw / 2
    val jaro =
      (m.toDouble / la + m.toDouble / lb + (m - halfT).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val maxp = math.min(4, math.min(la, lb))
      var l = 0
      while (l < maxp && s.charAt(l) == t.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  // ---- intersection count over distinct long arrays (r19) ----

  /** StaticInvoke kernel: |a ∩ b| for two arrays of DISTINCT longs —
    * value-identical to `size(array_intersect(a, b))` on the dedup
    * shingle-hash sets (which are `array_distinct` by construction, so
    * array_intersect's extra dedup is a no-op) without allocating the
    * intersection array per pair. The smaller side fills an
    * open-addressing long set; the larger side counts membership. */
  def interCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0L
    val (small, big, ns, ng) =
      if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    var cap = 8
    while (cap < ns * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    def slot(v: Long): Int = {
      var idx = (((v * 0x9e3779b97f4a7c15L) >>> 40) ^ v).toInt & mask
      while (used(idx) && keys(idx) != v) idx = (idx + 1) & mask
      idx
    }
    var i = 0
    while (i < ns) {
      val v = small.getLong(i)
      val idx = slot(v)
      keys(idx) = v; used(idx) = true
      i += 1
    }
    var cnt = 0L
    var j = 0
    while (j < ng) {
      val v = big.getLong(j)
      val idx = slot(v)
      if (used(idx)) cnt += 1
      j += 1
    }
    cnt
  }

  // ---- hashed-classifier weight fold (r18) ----
  // The linear classifier's token weight — md5-60 of "w_" + (md5-60(tok)
  // mod buckets), mapped to [-1, 1] — depends only on the token, so the
  // two md5 evaluations per token OCCURRENCE are memoized per executor
  // (the specCache discipline). The cache is SIZE-BOUNDED (r19, VERDICT
  // r18 #8): "the vocabulary is bounded" holds on a curated corpus but an
  // open-vocabulary 100 TB crawl (unique ids, typos) would grow an
  // unbounded per-executor map into an OOM vector — past the cap a missed
  // token just computes its weight inline and is not inserted. ~1 M
  // entries ≈ low tens of MB; a Zipfian vocabulary keeps its hot head
  // cached regardless of insertion order, so the memoization win is
  // intact at any corpus size.
  private[graft] val weightCacheMaxEntries = 1 << 20
  private val weightCaches =
    new java.util.concurrent.ConcurrentHashMap[Integer,
      java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]]()

  /** StaticInvoke kernel: the classifier's w_sum — an ORDERED left fold of
    * per-token weights over the token array, bit-identical to
    * `aggregate(transform(t, weight), 0.0, _ + _)` (same element order,
    * same IEEE additions; weights are never -0.0 so the 0.0 seed is
    * exact). Twin of the oracle's `list_reduce` formulation in
    * [[graft.operators.Scoring]]. */
  def hashedWeightSum(toks: ArrayData, numBuckets: Int): Double =
    hashedWeightSumBounded(toks, numBuckets, weightCacheMaxEntries)

  /** [[hashedWeightSum]] with an explicit cache-entry cap — the cap is a
    * memory bound only, never a semantics dial (a token past the cap is
    * computed inline from the same formula). Exposed for the spec that
    * proves cap-independence. */
  private[graft] def hashedWeightSumBounded(toks: ArrayData, numBuckets: Int,
      maxEntries: Int): Double = {
    val cache = weightCaches.computeIfAbsent(numBuckets,
      _ => new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]())
    var sum = 0.0
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val s = t.toString
      var w = cache.get(s)
      if (w == null) {
        val b = md5Hash60(t) % numBuckets
        val h = md5Hash60(UTF8String.fromString("w_" + b))
        w = java.lang.Double.valueOf((h % 2001 - 1000).toDouble / 1000.0)
        // size() on a CHM is a cheap (non-locking) estimate and only runs
        // on a MISS; a transient overshoot of a few entries is harmless —
        // the bound is against unbounded growth, not an exact budget
        if (cache.size < maxEntries) cache.put(s, w)
      }
      sum += w.doubleValue()
      i += 1
    }
    sum
  }

  // ---- single-pass text feature counts (r18) ----
  // One code-point walk replacing the quality/lang-id family's stack of
  // regex evaluations per row (lower + split + filter arrays, two
  // regexp_counts, 4×5 marker compares over a materialized token array).
  // Markers are all ≤ 3 chars, so a word is classified from a packed int
  // key with zero allocation.

  private def wordKey(w: String): Int = {
    val l = w.length
    (l << 24) | (w.charAt(0) << 16) |
      (if (l > 1) w.charAt(1) << 8 else 0) | (if (l > 2) w.charAt(2) else 0)
  }
  // en, de, fr, es — must stay in sync with TextAnalysis.langMarkers
  private val markerKeys: Array[Array[Int]] = Array(
    Array("the", "and", "of", "a", "is"),
    Array("der", "die", "das", "und", "ist"),
    Array("le", "la", "les", "et", "est"),
    Array("el", "los", "las", "y", "es")).map(_.map(wordKey))

  /** StaticInvoke kernel: `[n_chars, n_words, n_punct, hits_en, hits_de,
    * hits_fr, hits_es, has_cjk]` in ONE pass over the code points.
    *
    * Semantics mirror the expression formulation exactly on the corpus
    * contract (same ASCII discipline as [[TextBpe.normalize]]):
    * - n_chars = code-point count (= Spark `length`)
    * - words = maximal runs of [a-z0-9] after ASCII lowercasing; a
    *   non-ASCII code point never joins a word. This equals
    *   `split(lower(text),'[^a-z0-9]+')` whenever no non-ASCII code point
    *   lowercases INTO ASCII alnum (U+212A KELVIN SIGN-style exotics) —
    *   true of every harness corpus (measured: ASCII + CJK only) and of
    *   the oracle's own `$tokSql` twin; a violation would hash-mismatch.
    * - n_punct = code points outside [A-Za-z0-9 ] (pre-lowercase), the
    *   `regexp_count(text,'[^a-zA-Z0-9 ]')` twin
    * - hits_* = words equal to one of the 5 per-language markers
    * - has_cjk = 1 iff any code point in [U+4E00, U+9FFF] */
  def textFeatures(text: UTF8String): ArrayData = {
    val s = text.toString
    var nChars = 0L
    var nWords = 0L
    var nPunct = 0L
    val hits = new Array[Long](4)
    var cjk = 0L
    var runLen = 0
    var k0 = 0; var k1 = 0; var k2 = 0
    def endRun(): Unit = if (runLen > 0) {
      nWords += 1
      if (runLen <= 3) {
        val key = (runLen << 24) | (k0 << 16) | (k1 << 8) | k2
        var li = 0
        while (li < 4) {
          val mk = markerKeys(li)
          var mi = 0
          while (mi < mk.length) {
            if (mk(mi) == key) hits(li) += 1
            mi += 1
          }
          li += 1
        }
      }
      runLen = 0; k0 = 0; k1 = 0; k2 = 0
    }
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (cp >= 0x4E00 && cp <= 0x9FFF) cjk = 1L
      val lower = if (cp >= 'A' && cp <= 'Z') cp + 32 else cp
      val isWord = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (!isWord && cp != ' ') nPunct += 1
      if (isWord) {
        if (runLen == 0) k0 = lower
        else if (runLen == 1) k1 = lower
        else if (runLen == 2) k2 = lower
        runLen += 1
      } else endRun()
      i += Character.charCount(cp)
    }
    endRun()
    new GenericArrayData(Array(nChars, nWords, nPunct,
      hits(0), hits(1), hits(2), hits(3), cjk))
  }
}
