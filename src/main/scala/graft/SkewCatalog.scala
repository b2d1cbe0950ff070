package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Derive an enumeration-ACTIVE market-basket corpus from a ladder dir
  * (VERDICT r17 #4): on the uniform TPC-H part catalog the fractional
  * support floor legitimately empties `q_assoc_rules`' frequent set at
  * sf ≥ 0.1 (max item support 53 vs floor 74 at sf0.1 — SCALE.md r17),
  * so the x64/x256 rungs only ever measured the PRUNED path. This
  * generator remaps a fraction of lineitem's part keys onto a small hot
  * catalog with a Zipf(1)-ish popularity profile, producing items whose
  * support is a constant FRACTION of the basket count — so the frequent
  * set (items AND pairs) stays non-empty at every scale and the ladder
  * measures the active a-priori enumeration, not the empty prefilter.
  *
  * Design:
  *   - each (orderkey, partkey) basket item is remapped with probability
  *     `hotFrac` (deterministic xxhash64 coin — both the decision and the
  *     target are pure column functions, no RNG, rerunnable bit-for-bit);
  *   - the target is hot item r ∈ [1, hotItems] drawn log-uniformly
  *     (r = ⌊e^(u·ln hotItems)⌋ ⇒ P(r) ∝ 1/r — the Zipf(1) profile);
  *   - hot keys are NEGATED (-r) so they can never collide with real
  *     part keys, keeping the original catalog's uniform tail intact.
  *
  * With hotFrac = 0.3, hotItems = 30: the hottest item lands in ≈ 8 % of
  * basket items (support ≫ nbask/2000) and hot-hot pair supports sit
  * ≈ 10-100× over the nbask/10000 pair floor — frequent at EVERY rung,
  * because both the supports and the floors scale with nbask.
  *
  * Only lineitem is derived (q_assoc_* reads nothing else); point Bench
  * at the output dir with the source dir's other tables absent — the
  * arg-restricted runs (`Bench q_assoc_rules`) never touch them.
  *
  * usage: runMain graft.SkewCatalog <srcDir> <outDir> [hotFrac] [hotItems]
  */
object SkewCatalog {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SkewCatalog <srcDir> <outDir> [hotFrac] [hotItems]")
    val src = args(0)
    val out = args(1)
    val hotFrac = args.lift(2).map(_.toDouble).getOrElse(0.3)
    val hotItems = args.lift(3).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    // two independent 20-bit uniform draws from one 64-bit hash: low bits
    // decide the coin, high bits place the rank — reusing one hash for
    // both would correlate "is hot" with "which hot item"
    val h = xxhash64(col("l_orderkey"), col("l_partkey"), lit("skew"))
    val uCoin = pmod(h, lit(1048576L)).cast("double") / 1048576.0
    val uRank = pmod(shiftright(h, 20), lit(1048576L)).cast("double") / 1048576.0
    val rank = least(floor(exp(uRank * math.log(hotItems.toDouble))) + 1,
      lit(hotItems.toLong))
    val skewed = li.withColumn("l_partkey",
      when(uCoin < hotFrac, -rank).otherwise(col("l_partkey")))
    skewed.repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // report the support profile vs the fractional floors so the ladder
    // log carries proof the enumeration is ACTIVE (the whole point)
    val bask = spark.read.parquet(s"$out/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nbask = bask.select(countDistinct(col("ok"))).collect()(0).getLong(0)
    val itemFloor = (nbask + 1999) / 2000
    val pairFloor = (nbask + 9999) / 10000
    val freq = bask.groupBy("pk").agg(count(lit(1)).as("n"))
      .where(col("n") >= itemFloor)
    val nFreq = freq.count()
    val maxSup = freq.agg(max("n")).collect()(0)
    println(s"""{"skewed":"$out","hot_frac":$hotFrac,"hot_items":$hotItems,"nbask":$nbask,"item_floor":$itemFloor,"pair_floor":$pairFloor,"n_frequent_items":$nFreq,"max_support":${if (maxSup.isNullAt(0)) 0 else maxSup.getLong(0)}}""")
    spark.stop()
  }
}
