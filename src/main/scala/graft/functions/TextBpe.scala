package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer kernel with a pinned merge table.
  *
  * Every token-budget operator in a pretraining pipeline (chunking, shard
  * packing, per-doc token counts, LM surprisal) should measure REAL subword
  * tokens, not whitespace words — whitespace counts misestimate sequence
  * lengths ~1.3-1.5×. This kernel is the engine's subword tokenizer: the
  * classic BPE encode loop (repeatedly merge the lowest-rank adjacent token
  * pair — the algorithm behind the GPT-2/RoBERTa tokenizers, Sennrich et
  * al. 2016) against a PINNED, deterministic merge table, exposed as a
  * `StaticInvoke` codegen kernel like the rest of [[TextHashes]].
  *
  * The merge table is the single source of truth for BOTH engines: the
  * Scala kernel consults `rank`, and [[mergeValuesSql]] renders the same
  * table as a DuckDB `VALUES` list that the oracle replays with a
  * recursive CTE of sequential `replace()` calls over a delimited token
  * string (see [[graft.operators.Tokenize]]).
  *
  * Oracle-replay soundness: the SQL replay applies each merge ONCE, in rank
  * order, as a global string replace; the kernel runs the min-rank loop.
  * The two are equivalent because the table is WELL-FORMED — each side of a
  * merge is a single character or the result of an earlier merge — so a
  * later merge can never create a new occurrence of an earlier pair (its
  * output token is not a side of any earlier rule), and within one rule a
  * left-to-right global replace merges exactly the occurrences the loop
  * merges. `BpeSpec` property-tests this equivalence on random inputs.
  *
  * Tokens are delimited in the replay string as `|tok|` with boundaries
  * doubled between tokens (`||a||b||`); a merge (a,b)→ab is the replace
  * `|a||b|` → `|ab|`. The doubling makes patterns anchor on whole tokens
  * ONLY (a pattern can never match the tail of a longer token, and
  * adjacent matches never share delimiter characters, so global replace
  * is exactly the left-to-right non-overlapping merge).
  *
  * Normalization (identical in both engines, ASCII-only so no libc/ICU
  * case-folding divergence): keep `[A-Za-z0-9 ]`, lowercase A-Z, then map
  * the space to `_` (the word-boundary marker, as in SentencePiece).
  */
object TextBpe {

  /** Pinned merges, rank order (rank = index). WELL-FORMED by construction:
    * each side is a single normalized char or the output of an EARLIER
    * merge — required for the sequential-replay oracle equivalence. */
  val merges: Vector[(String, String)] = Vector(
    "t" -> "h", "i" -> "n", "e" -> "r", "a" -> "n", "r" -> "e", // 1-5
    "o" -> "n", "h" -> "e", "a" -> "t", "e" -> "n", "e" -> "s", // 6-10
    "o" -> "r", "t" -> "e", "e" -> "d", "i" -> "s", "i" -> "t", // 11-15
    "a" -> "l", "a" -> "r", "s" -> "t", "t" -> "o", "n" -> "g", // 16-20
    "s" -> "e", "h" -> "a", "o" -> "u", "l" -> "e", "m" -> "e", // 21-25
    "d" -> "e", "c" -> "o", "r" -> "o", "l" -> "i",             // 26-29
    "th" -> "e", "in" -> "g", "an" -> "d", "i" -> "on",         // 30-33
    "er" -> "s",                                                // 34
    "_" -> "t", "_" -> "a", "_" -> "the", "_t" -> "o",          // 35-38
    "_a" -> "n", "0" -> "0")                                    // 39-40

  // well-formedness: every side is a single char or an earlier output
  {
    val seen = scala.collection.mutable.Set[String]()
    merges.foreach { case (a, b) =>
      require(a.length == 1 || seen(a), s"merge side '$a' not yet formed")
      require(b.length == 1 || seen(b), s"merge side '$b' not yet formed")
      seen += (a + b)
    }
  }

  /** ASCII-only normalization: keep [A-Za-z0-9 ], lowercase, space→'_'.
    * SQL twin: `replace(lower(regexp_replace(text,'[^a-zA-Z0-9 ]','','g')),
    * ' ', '_')` — identical because only ASCII survives the strip. */
  def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (c == ' ') sb.append('_')
      i += 1
    }
    sb.toString
  }

  // ---- int-id encode machinery (the hot path) ----
  // Token vocabulary = 37 base chars ([a-z0-9_]) + one id per merge
  // output. The encode loop then works on int arrays with a dense
  // pair→rank matrix — zero allocation and two array reads per adjacent
  // pair, instead of a string concat + HashMap probe (the first-cut
  // implementation cost 1.7 s for the sf0.1 corpus; this one is the
  // per-row kernel shape a 100 TB scan wants).
  private val vocabSize = 37 + merges.size
  private val tokenString: Array[String] = {
    val arr = new Array[String](vocabSize)
    var i = 0
    while (i < 26) { arr(i) = String.valueOf(('a' + i).toChar); i += 1 }
    while (i < 36) { arr(i) = String.valueOf(('0' + i - 26).toChar); i += 1 }
    arr(36) = "_"
    merges.zipWithIndex.foreach { case ((a, b), k) => arr(37 + k) = a + b }
    arr
  }
  @inline private def charId(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= '0' && c <= '9') 26 + (c - '0')
    else 36 // '_' (normalize emits nothing else)
  private val stringId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocabSize * 2)
    var i = 0
    while (i < vocabSize) {
      val prev = m.put(tokenString(i), Integer.valueOf(i))
      require(prev == null, s"duplicate vocab surface '${tokenString(i)}'")
      i += 1
    }
    m
  }
  // pairRank(a*vocabSize + b) = merge rank or MaxValue; pairId = output id
  private val pairRank: Array[Int] = Array.fill(vocabSize * vocabSize)(Int.MaxValue)
  private val pairId: Array[Int] = new Array[Int](vocabSize * vocabSize)
  merges.zipWithIndex.foreach { case ((a, b), k) =>
    val key = stringId.get(a) * vocabSize + stringId.get(b)
    require(pairRank(key) == Int.MaxValue, s"duplicate merge pair ($a,$b)")
    pairRank(key) = k
    pairId(key) = 37 + k
  }

  /** The BPE encode loop: start from normalized chars; repeatedly find the
    * lowest-rank adjacent pair present and merge ALL its left-to-right
    * non-overlapping occurrences; stop when no pair is in the table.
    * O(#distinct-merges-applied × length), two array reads per pair probe.
    * Returns int token ids into [[tokenString]]; `len` slots of `buf` are
    * valid on return. */
  private def encodeIds(norm: String): (Array[Int], Int) = {
    var n = norm.length
    val ids = new Array[Int](math.max(n, 1))
    var i = 0
    while (i < n) { ids(i) = charId(norm.charAt(i)); i += 1 }
    var continue = n > 1
    while (continue) {
      var best = Int.MaxValue
      i = 0
      while (i < n - 1) {
        val r = pairRank(ids(i) * vocabSize + ids(i + 1))
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        // merge all LTR non-overlapping occurrences of the best pair,
        // compacting in place
        var w = 0
        i = 0
        while (i < n) {
          if (i < n - 1 && pairRank(ids(i) * vocabSize + ids(i + 1)) == best) {
            ids(w) = pairId(ids(i) * vocabSize + ids(i + 1)); i += 2
          } else { ids(w) = ids(i); i += 1 }
          w += 1
        }
        n = w
        continue = n > 1
      }
    }
    (ids, n)
  }

  /** String-token encode (spec surface + [[bpe]] output). */
  def encodeJava(text: String): java.util.ArrayList[String] = {
    val norm = normalize(text)
    val (ids, n) = encodeIds(norm)
    val out = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) { out.add(tokenString(ids(i))); i += 1 }
    out
  }

  /** Reference replay: the oracle's sequential global-replace formulation,
    * kept in Scala so `BpeSpec` can property-check kernel ≡ replay without
    * a DuckDB round trip. Mirrors the SQL recursive CTE character for
    * character (doubled-delimiter encoding, one replace per rank). */
  def replayJava(text: String): java.util.ArrayList[String] = {
    val norm = normalize(text)
    val sb = new java.lang.StringBuilder(norm.length * 3 + 2)
    sb.append('|')
    var i = 0
    while (i < norm.length) {
      sb.append('|').append(norm.charAt(i)).append('|')
      i += 1
    }
    sb.append('|')
    var s = sb.toString
    merges.foreach { case (a, b) =>
      s = s.replace("|" + a + "||" + b + "|", "|" + a + b + "|")
    }
    val out = new java.util.ArrayList[String]()
    // trim all leading/trailing '|', split on '||', drop empties — the
    // same trim(s,'|') + string_split + list_filter the oracle uses
    val trimmed = s.replaceAll("^\\|+|\\|+$", "")
    if (trimmed.nonEmpty) trimmed.split("\\|\\|").foreach(t => if (t.nonEmpty) out.add(t))
    out
  }

  // token id → interned UTF8String, built once — the kernel emits shared
  // immutable instances instead of re-encoding each token's bytes per row
  private val tokenUtf8: Array[UTF8String] =
    tokenString.map(UTF8String.fromString)

  /** StaticInvoke kernel: BPE token array for a document. */
  def bpe(text: UTF8String): ArrayData = {
    val (ids, n) = encodeIds(normalize(text.toString))
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) { arr(i) = tokenUtf8(ids(i)); i += 1 }
    new GenericArrayData(arr)
  }

  /** StaticInvoke kernel: BPE token count only (skips materializing the
    * UTF8String array — the shape chunk/pack budgets want). */
  def bpeCount(text: UTF8String): Long =
    encodeIds(normalize(text.toString))._2.toLong

  /** The merge table as a DuckDB VALUES list `(rank, pattern, replacement)`
    * in the doubled-delimiter encoding — the oracle's recursive CTE joins
    * on rank and applies one `replace` per step. */
  def mergeValuesSql: String =
    merges.zipWithIndex.map { case ((a, b), i) =>
      s"(${i + 1}, '|$a||$b|', '|$a$b|')"
    }.mkString(", ")

  // ---- parametric encode (the BPE TRAINING loop's re-encode step, r15) ----

  /** A runtime merge table compiled to the same dense pair→(rank, id)
    * matrix the pinned kernel uses. Vocab = 37 base chars + one id per
    * spec merge; sides must be existing tokens (well-formed by
    * construction when the spec comes from a training loop, which only
    * ever merges tokens that exist in the current tokenization). */
  private final class SpecTable(spec: String) {
    val specMerges: Array[(String, String)] =
      if (spec.isEmpty) Array.empty
      else spec.split(",").map { m =>
        val sp = m.indexOf(' ')
        (m.substring(0, sp), m.substring(sp + 1))
      }
    val vocabSize: Int = 37 + specMerges.length
    val tokenStr: Array[String] = {
      val arr = new Array[String](vocabSize)
      var i = 0
      while (i < 26) { arr(i) = String.valueOf(('a' + i).toChar); i += 1 }
      while (i < 36) { arr(i) = String.valueOf(('0' + i - 26).toChar); i += 1 }
      arr(36) = "_"
      specMerges.zipWithIndex.foreach { case ((a, b), k) => arr(37 + k) = a + b }
      arr
    }
    private val sid = new java.util.HashMap[String, Integer](vocabSize * 2)
    tokenStr.zipWithIndex.foreach { case (t, i) => sid.put(t, i) }
    val pRank: Array[Int] = Array.fill(vocabSize * vocabSize)(Int.MaxValue)
    val pId: Array[Int] = new Array[Int](vocabSize * vocabSize)
    specMerges.zipWithIndex.foreach { case ((a, b), k) =>
      val ia = sid.get(a); val ib = sid.get(b)
      require(ia != null && ib != null, s"spec side '$a'/'$b' not yet formed")
      val key = ia * vocabSize + ib
      pRank(key) = k
      pId(key) = 37 + k
    }
    val tokenU8: Array[UTF8String] = tokenStr.map(UTF8String.fromString)
  }

  // compiled spec tables, keyed by the spec string; a training run touches
  // k distinct specs per executor JVM — bounded, never corpus-sized
  private val specCache =
    new java.util.concurrent.ConcurrentHashMap[String, SpecTable]()

  /** StaticInvoke kernel: BPE token array under a RUNTIME merge table
    * (`spec` = comma-joined "left right" merges in rank order, "" = plain
    * char tokenization). Same min-rank encode loop as the pinned kernel;
    * the compiled table is memoized per spec per JVM. */
  def bpeWith(text: UTF8String, spec: UTF8String): ArrayData = {
    val (t, ids, n) = encodeCore(text, spec)
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) { arr(i) = t.tokenU8(ids(i)); i += 1 }
    new GenericArrayData(arr)
  }

  /** Shared encode loop for the runtime-spec kernels: (table, token ids,
    * live length). */
  private def encodeCore(text: UTF8String, spec: UTF8String)
      : (SpecTable, Array[Int], Int) = {
    val t = specCache.computeIfAbsent(spec.toString, s => new SpecTable(s))
    val norm = normalize(text.toString)
    var n = norm.length
    val ids = new Array[Int](math.max(n, 1))
    var i = 0
    while (i < n) { ids(i) = charId(norm.charAt(i)); i += 1 }
    var continue = n > 1
    while (continue) {
      var best = Int.MaxValue
      i = 0
      while (i < n - 1) {
        val r = t.pRank(ids(i) * t.vocabSize + ids(i + 1))
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        var w = 0
        i = 0
        while (i < n) {
          if (i < n - 1 && t.pRank(ids(i) * t.vocabSize + ids(i + 1)) == best) {
            ids(w) = t.pId(ids(i) * t.vocabSize + ids(i + 1)); i += 2
          } else { ids(w) = ids(i); i += 1 }
          w += 1
        }
        n = w
        continue = n > 1
      }
    }
    (t, ids, n)
  }

  /** StaticInvoke kernel: PER-DOCUMENT adjacent-pair counts under a
    * runtime merge table — `array<struct<pair: string, cnt: long>>`, pair
    * rendered exactly as the explode formulation's `concat(t[i],' ',t[i+1])`.
    * This is map-side pre-aggregation moved INTO the scan: the BPE
    * training iteration previously exploded one row per adjacent pair
    * (~tokens-1 UTF8String concats per doc per iteration — the dominant
    * allocation of q_bpe_train's inner loop), where the distinct-pair
    * vocabulary per doc is bounded by min(tokens-1, vocab²). Emitting
    * (pair, count) per doc shrinks the exchange input to the pair
    * vocabulary and cuts the per-iteration garbage ~10× — the same shape
    * a distributed BPE trainer ships between workers at 100 TB. */
  def bpePairsWith(text: UTF8String, spec: UTF8String): ArrayData = {
    val (t, ids, n) = encodeCore(text, spec)
    pairCounts(ids, n, t.vocabSize, t.tokenU8)
  }

  /** StaticInvoke kernel: per-document adjacent-pair counts under the
    * PINNED merge table — the q_bpe_pair_stats corpus statistic without
    * materializing one row per pair occurrence. */
  def bpePairs(text: UTF8String): ArrayData = {
    val (ids, n) = encodeIds(normalize(text.toString))
    pairCounts(ids, n, vocabSize, tokenUtf8)
  }

  private def pairCounts(ids: Array[Int], n: Int, vocab: Int,
      tokU8: Array[UTF8String]): ArrayData = {
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val counts = new scala.collection.mutable.LongMap[Long]()
    var i = 0
    while (i < n - 1) {
      val k = (ids(i) * vocab + ids(i + 1)).toLong
      counts.update(k, counts.getOrElse(k, 0L) + 1L)
      i += 1
    }
    // key-sorted emission: deterministic kernel output (the downstream
    // agg is order-free, but stable output keeps runs byte-comparable)
    val keys = counts.keysIterator.toArray
    java.util.Arrays.sort(keys)
    val arr = new Array[Any](keys.length)
    i = 0
    while (i < keys.length) {
      val k = keys(i)
      val a = (k / vocab).toInt
      val b = (k % vocab).toInt
      val pair = UTF8String.concat(tokU8(a), SpacerU8, tokU8(b))
      arr(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](pair, counts(k)))
      i += 1
    }
    new GenericArrayData(arr)
  }

  private val SpacerU8 = UTF8String.fromString(" ")

  // ---- incremental training-state kernels (r18) ----
  // The training loop used to re-encode every document from raw text under
  // the grown merge table each iteration — O(rank) passes per doc per
  // iteration, O(k²) total. These three kernels instead carry the CURRENT
  // tokenization as a persisted BYTE array (vocab = 37 base + k merges ≤
  // 127, so every id fits one byte) and advance it by exactly one merge
  // pass per iteration: O(k) total passes, no normalize/charId redo. Bytes
  // matter: BinaryType hits the primitive columnar-cache path (a straight
  // memcpy per value), where array<int> went through the GENERIC per-value
  // serializer — measured 10× slower cache write per iteration, single
  // task, with multi-second eviction spikes.

  /** Training ids fit a byte: 37 base chars + at most 90 learned merges. */
  val maxTrainMerges: Int = 127 - 37

  /** StaticInvoke kernel: rank-0 training state — normalized text as base
    * char ids into the [a-z0-9_] vocabulary, one byte per token. */
  def bpeCharIds(text: UTF8String): Array[Byte] = {
    val norm = normalize(text.toString)
    val out = new Array[Byte](norm.length)
    var i = 0
    while (i < norm.length) { out(i) = charId(norm.charAt(i)).toByte; i += 1 }
    out
  }

  /** StaticInvoke kernel: ONE left-to-right non-overlapping merge pass
    * (aId,bId)→newId over an id array — the incremental training step.
    * Equivalent to a full re-encode under the grown table: the input is
    * the fixpoint of all earlier merges (no earlier pair exists), a new
    * output id is never a side of an earlier rule (well-formedness, object
    * scaladoc), and a merged occurrence cannot create a fresh (aId,bId)
    * adjacency (the new token differs from both sides) — so one pass IS
    * the fixpoint under the grown table. */
  def bpeMergeOne(ids: Array[Byte], aId: Int, bId: Int, newId: Int): Array[Byte] = {
    val n = ids.length
    if (n < 2) return ids
    val a = aId.toByte
    val b = bId.toByte
    val out = new Array[Byte](n)
    var i = 0
    var w = 0
    while (i < n) {
      if (i < n - 1 && ids(i) == a && ids(i + 1) == b) {
        out(w) = newId.toByte; i += 2
      } else { out(w) = ids(i); i += 1 }
      w += 1
    }
    if (w == n) out else java.util.Arrays.copyOf(out, w)
  }

  // dense per-thread count buffer for bpePairIdCounts: allocated once per
  // executor thread (128 KB + touched list), dirty slots re-zeroed after
  // each row — a fresh zeroed array PER ROW was the measured hot spot
  private val pairCountBuf = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](1 << 14)
  }
  private val pairTouchedBuf = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](1 << 14)
  }

  /** StaticInvoke kernel: per-doc adjacent-pair counts over an id array,
    * keyed `(a << 7) | b` — the integer twin of [[bpePairsWith]]'s output
    * for the incremental loop. Pair surfaces are resolved once per
    * iteration on the driver, never per row. Dense 2^14-slot thread-local
    * count buffer: zero hashing, emitted in key order. */
  def bpePairIdCounts(ids: Array[Byte]): ArrayData = {
    val n = ids.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val counts = pairCountBuf.get()
    val touched = pairTouchedBuf.get()
    var nt = 0
    var i = 0
    while (i < n - 1) {
      val k = ((ids(i) & 0x7f) << 7) | (ids(i + 1) & 0x7f)
      if (counts(k) == 0L) { touched(nt) = k; nt += 1 }
      counts(k) += 1
      i += 1
    }
    java.util.Arrays.sort(touched, 0, nt)
    val arr = new Array[Any](nt)
    var j = 0
    while (j < nt) {
      val k = touched(j)
      arr(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](k.toLong, counts(k)))
      counts(k) = 0L // leave the buffer clean for the next row
      j += 1
    }
    new GenericArrayData(arr)
  }
}
