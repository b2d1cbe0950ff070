package graft.operators

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch built from scratch as DataFrame
  * aggregations, with every step — hash, bucket, rank, register maxima,
  * harmonic sum, bias correction — replayable in ANSI SQL (Flajolet et al.
  * 2007 for the algorithm; the md5-60 hash family is this repo's
  * oracle-replayable convention). Complements `q_approx_distinct` (Spark's
  * built-in HLL, oracled only via its error bound): here the ALGORITHM is
  * cross-engine checked, not just bounded.
  *
  * Scale shape: one shuffle of (bucket, rank) pairs pre-combined map-side
  * to ≤ m rows per partition; the register table is m rows total. Merging
  * shards/streams is register-wise MAX — the reason HLL is the standard
  * distributed distinct counter.
  *
  * Engine-parity notes (why the oracle matches bit-for-bit):
  *   - rank via `length(bin(x))` — identical minimal binary strings on
  *     both engines; no float log2;
  *   - the harmonic sum Σ 2^−Mj is computed as the INTEGER
  *     Σ 2^(RankBits+1−Mj) (all terms exact, max m·2^53 < 2^63) and divided
  *     once at the end — no order-dependent double accumulation;
  *   - the one transcendental (ln in linear counting) is rounded. */
object HyperLogLog {

  /** 60-bit md5 hash = 8-bit bucket + 52 rank bits. */
  private val BucketBits = 8
  val NumBuckets: Int = 1 << BucketBits // m = 256
  private val RankBits = 60 - BucketBits // 52
  private val Alpha = 0.7213 / (1.0 + 1.079 / NumBuckets)

  /** α·m² — shared with the SQL oracle as a literal (Double.toString is
    * shortest round-trip form, so both engines parse the identical value). */
  val AlphaMM: Double = Alpha * NumBuckets * NumBuckets

  /** Register table: `(bucket, mj)` for every one of the m buckets (empty
    * buckets present with mj = 0), mj = max leading-zero rank. */
  def registers(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    GraftFunctions.register(spark)
    val h = md5Hash60(concat(lit("hll_"), col(keyCol).cast("string")))
    val observed = df
      .select(shiftrightunsigned(h, RankBits).as("bucket"),
        h.bitwiseAND(lit((1L << RankBits) - 1)).as("low"))
      .select(col("bucket"),
        when(col("low") === 0L, lit(RankBits + 1))
          .otherwise(lit(RankBits + 1) - length(bin(col("low")))).cast("long").as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("mj"))
    spark.range(NumBuckets).select(col("id").as("bucket"))
      .join(observed, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("mj"), lit(0L)).as("mj"))
  }

  /** One-row estimate from the register table: `(m, v_empty, est)` —
    * harmonic mean with linear-counting small-range correction, `est`
    * rounded (the ln is the only transcendental in the pipeline). */
  def estimate(regs: DataFrame): DataFrame = {
    val m = NumBuckets.toDouble
    // Σ 2^(53-mj) as exact integers; Z = Σ/2^53 in one division
    val term = call_function("shiftleft", lit(1L),
      (lit(RankBits + 1) - col("mj")).cast("int"))
    regs.agg(
        count(lit(1)).as("m"),
        sum(when(col("mj") === 0L, 1L).otherwise(0L)).as("v_empty"),
        sum(term).as("sum_int"))
      .select(col("m"), col("v_empty"),
        round(
          when(col("v_empty") > 0 &&
              lit(AlphaMM) / (col("sum_int") / math.pow(2.0, RankBits + 1)) <= lit(2.5 * m),
            lit(m) * log(lit(m) / col("v_empty")))
          .otherwise(lit(AlphaMM) / (col("sum_int") / math.pow(2.0, RankBits + 1))),
          4).as("est"))
  }

  /** SPARSE per-group register table: `(groupCols…, bucket, mj)` with only
    * the OBSERVED buckets present (observed ⇒ mj ≥ 1; absent ⇒ mj = 0).
    * Sparse is the mergeable-state shape a 100 TB rollup ships between
    * levels: ≤ m rows per group, pre-combined map-side, one exchange on
    * `(groupCols, bucket)`. */
  def registersBy(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val h = md5Hash60(concat(lit("hll_"), col(keyCol).cast("string")))
    val g = groupCols.map(col)
    df.select(g :+ shiftrightunsigned(h, RankBits).as("bucket")
        :+ h.bitwiseAND(lit((1L << RankBits) - 1)).as("low"): _*)
      .select(g :+ col("bucket") :+
        when(col("low") === 0L, lit(RankBits + 1))
          .otherwise(lit(RankBits + 1) - length(bin(col("low")))).cast("long").as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("mj"))
  }

  /** Roll sparse registers up to a COARSER grouping (possibly global,
    * `coarser = Nil`): register-wise MAX — the whole point of HLL as the
    * distributed distinct counter. No rescan of the base data; input and
    * output are both ≤ m rows per group. */
  def mergeRegisters(regs: DataFrame, coarser: Seq[String]): DataFrame =
    regs.groupBy((coarser :+ "bucket").map(col): _*)
      .agg(max(col("mj")).as("mj"))

  /** Grouped estimate from SPARSE registers: absent buckets contribute
    * v_empty (= m − observed) and 2^(RankBits+1) each to the harmonic sum
    * — algebraically identical to [[estimate]] over dense registers, all
    * integer until the final division. */
  def estimateBy(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val m = NumBuckets.toDouble
    val term = call_function("shiftleft", lit(1L),
      (lit(RankBits + 1) - col("mj")).cast("int"))
    val grouped =
      if (groupCols.isEmpty) regs.agg(count(lit(1)).as("n_obs"), sum(term).as("sum_obs"))
      else regs.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("n_obs"), sum(term).as("sum_obs"))
    val vEmpty = lit(NumBuckets.toLong) - col("n_obs")
    val sumInt = col("sum_obs") + vEmpty * lit(1L << (RankBits + 1))
    val raw = lit(AlphaMM) / (sumInt / math.pow(2.0, RankBits + 1))
    grouped.select(groupCols.map(col) :+
      round(
        when(vEmpty > 0 && raw <= lit(2.5 * m),
          lit(m) * log(lit(m) / vEmpty))
        .otherwise(raw),
        4).as("est"): _*)
  }
}
