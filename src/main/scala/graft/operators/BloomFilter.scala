package graft.operators

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter build + probe over a key column — the scale
  * path for the incremental-novelty gate: at 100 TB the "seen corpus" is
  * billions of digests, and anti-joining every incoming batch against it
  * shuffles the whole history. A Bloom filter compresses the seen side to
  * `bits/8` bytes (a billion keys at 1% FP ≈ ~1.2 GB — broadcastable), so the
  * membership test becomes a map-side broadcast join; only the small
  * might-be-duplicate remainder needs the exact anti-join. No false
  * negatives: `mightContain = false` is PROOF the key is new.
  *
  * The filter is built as a DataFrame aggregation (explode k bit positions
  * → `bit_or` per 64-bit word), so the build is one shuffle of ≤ words
  * rows; the probe broadcasts the word table. Hash functions are the
  * md5-60 family (`graft_md5_60` of `"bloom<i>_" + key`) — deterministic,
  * seedless, and replayable in ANSI SQL, which is how the DuckDB oracle
  * checks the whole pipeline bit-for-bit.
  */
object BloomFilter {

  /** Bits packed per 64-bit word: 63, not 64 — `1 << 63` overflows a
    * signed BIGINT under checked arithmetic (DuckDB errors on it), and the
    * oracle must replay the exact packing. One wasted bit per word. */
  private val WordBits = 63L

  /** k bit positions for a key: md5-60("bloom<i>_" + key) mod bits. */
  private def positions(key: Column, bits: Int, k: Int): Column =
    array((0 until k).map(i =>
      pmod(md5Hash60(concat(lit(s"bloom${i}_"), key.cast("string"))), lit(bits.toLong))): _*)

  /** Build the filter: one row per set 64-bit word, `(w: long, bits: long)`.
    * Words never touched stay absent (probe treats absent as zero). */
  def build(df: DataFrame, keyCol: String, bits: Int = 4096, k: Int = 3): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(explode(positions(col(keyCol), bits, k)).as("p"))
      .groupBy(floor(col("p") / WordBits).cast("long").as("w"))
      // call_function: the functions-API shiftleft only takes a literal
      // shift amount; the SQL registry form shifts by a column
      .agg(bit_or(call_function("shiftleft",
        lit(1L), pmod(col("p"), lit(WordBits)).cast("int"))).as("bits"))
  }

  /** Probe: adds `mightContain` to every row of `probe` — true iff all k
    * bits are set. The (≤ bits/64)-row filter table is broadcast; the probe
    * side never shuffles. Row identity is preserved via a per-row id (fully
    * duplicate probe rows each get their own output row), and the filter
    * side's columns are renamed `__bloom_*` so a probe frame that already
    * has `w`/`bits` columns can't collide. */
  def mightContain(probe: DataFrame, bloom: DataFrame, keyCol: String,
      bits: Int = 4096, k: Int = 3): DataFrame = {
    GraftFunctions.register(probe.sparkSession)
    val cols = probe.columns
    val bloomT = bloom.select(col("w").as("__bloom_w"), col("bits").as("__bloom_bits"))
    val pos = probe.withColumn("__rid", monotonically_increasing_id())
      .withColumn("__p", explode(positions(col(keyCol), bits, k)))
    pos.join(broadcast(bloomT),
        floor(col("__p") / WordBits).cast("long") === col("__bloom_w"), "left")
      .withColumn("__hit",
        (coalesce(col("__bloom_bits"), lit(0L))
          .bitwiseAND(call_function("shiftleft",
            lit(1L), pmod(col("__p"), lit(WordBits)).cast("int"))) =!= 0L))
      .groupBy((col("__rid") +: cols.map(col)): _*)
      .agg(bool_and(col("__hit")).as("mightContain"))
      .drop("__rid")
  }

  /** Collect the filter's set words to a driver map — the broadcastable
    * form of the filter (≤ bits/63 entries; a billion-key filter at 1% FP
    * is ~1.2 GB of words, which is what Spark's own bloom-join broadcasts). */
  def words(bloom: DataFrame): Map[Long, Long] =
    bloom.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Pure-expression probe against a collected word map: the k bit tests
    * compile to one per-row conjunction over a literal map — no join, no
    * aggregation, so it runs INSIDE append-mode streaming plans (the
    * join+groupBy probe above is illegal there) and is entirely map-side.
    * Same bit layout as [[build]]/[[mightContain]]; `mightContain = false`
    * still PROVES the key unseen. */
  def mightContainLit(probe: DataFrame, bloomWords: Map[Long, Long], keyCol: String,
      bits: Int = 4096, k: Int = 3): DataFrame = {
    GraftFunctions.register(probe.sparkSession)
    val wordMap = typedLit(bloomWords)
    val tests = (0 until k).map { i =>
      val p = pmod(md5Hash60(concat(lit(s"bloom${i}_"), col(keyCol).cast("string"))),
        lit(bits.toLong))
      coalesce(element_at(wordMap, floor(p / WordBits).cast("long")), lit(0L))
        .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(WordBits)).cast("int"))) =!= 0L
    }
    probe.withColumn("mightContain", tests.reduce(_ && _))
  }
}
