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
}
