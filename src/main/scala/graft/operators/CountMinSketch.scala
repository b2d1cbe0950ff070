package graft.operators

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch build + probe as DataFrame aggregations — approximate
  * frequency estimation for heavy-hitter / vocabulary-pruning passes where
  * the exact per-term count table itself is too large to materialize.
  *
  * At 100 TB the exact token-frequency table can run to billions of rows;
  * a CMS compresses it to `depth × width` counters (d=4, w=2¹⁴ → 512 KB —
  * broadcastable) with a ONE-SIDED error: estimates never undercount, and
  * overcount by ≤ εN (ε = e/w) with probability 1 − e^(−d). Build is one
  * shuffle of (row, col) pairs pre-combined map-side; probe broadcasts the
  * counter table and takes the min across the d rows.
  *
  * Hashes are the md5-60 family (`"cms<row>_" + key`), deterministic and
  * seedless, so the DuckDB oracle replays the ENTIRE sketch — every
  * counter, every probe, every min — next to the exact counts
  * (Cormode & Muthukrishnan, J.Algorithms 2005, for the structure; the
  * md5-60 derivation is this repo's oracle-replayable convention).
  */
object CountMinSketch {

  /** Counter column for one row of the sketch: md5-60("cms<r>_" + key) mod width. */
  private def bucket(key: Column, r: Int, width: Int): Column =
    pmod(md5Hash60(concat(lit(s"cms${r}_"), key.cast("string"))), lit(width.toLong))

  /** Build the sketch from raw keys (one occurrence per row): one output
    * row per touched counter, `(r, c, cnt)` — map-side partial
    * aggregation, then a single narrow shuffle on (r, c). */
  def build(df: DataFrame, keyCol: String, depth: Int = 4, width: Int = 16384): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(posexplode(array((0 until depth).map(r =>
        bucket(col(keyCol), r, width)): _*)).as(Seq("r", "c")))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Build from a pre-aggregated `(key, weight)` table — identical sketch
    * to [[build]] over the raw occurrences when `weightCol` carries their
    * counts, at the cost of the (usually already materialized) aggregate
    * instead of a second raw scan. Also the entry point for genuinely
    * weighted frequencies. */
  def buildWeighted(df: DataFrame, keyCol: String, weightCol: String,
      depth: Int = 4, width: Int = 16384): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(weightCol).as("__w"),
        posexplode(array((0 until depth).map(r =>
          bucket(col(keyCol), r, width)): _*)).as(Seq("r", "c")))
      .groupBy(col("r"), col("c"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Estimate each probe key's frequency: min over the d counters the key
    * hashes to. The sketch table is broadcast; the probe side never
    * shuffles (beyond its own final aggregation). Missing counters are
    * zero (key definitely unseen). Row identity is preserved via a per-row
    * id (fully duplicate probe rows each get their own output row), and
    * the sketch side's columns are renamed `__cms_*` so a probe frame that
    * already has `r`/`c`/`cnt` columns can't collide. */
  def estimate(probe: DataFrame, sketch: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 16384): DataFrame = {
    GraftFunctions.register(probe.sparkSession)
    val cols = probe.columns
    val sketchT = sketch.select(
      col("r").as("__cms_r"), col("c").as("__cms_c"), col("cnt").as("__cms_cnt"))
    probe.withColumn("__rid", monotonically_increasing_id())
      .select(col("__rid") +: cols.map(col) :+
        posexplode(array((0 until depth).map(r =>
          bucket(col(keyCol), r, width)): _*)).as(Seq("__r", "__c")): _*)
      .join(broadcast(sketchT),
        col("__r") === col("__cms_r") && col("__c") === col("__cms_c"), "left")
      .groupBy((col("__rid") +: cols.map(col)): _*)
      .agg(min(coalesce(col("__cms_cnt"), lit(0L))).as("est"))
      .drop("__rid")
  }
}
