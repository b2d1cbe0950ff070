package graft

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an r× corpus from a harness SF dir — the empirical scale ladder
  * (SCALE.md). `runMain graft.ScaleLadder <baseSfDir> <outDir> <r>` writes
  * the same table layout (`<name>.parquet`, directories) with every FACT
  * table replicated r times and the dimension tables copied verbatim, so
  * `Bench` runs unchanged against the derived dir.
  *
  * Replication is designed so that per-unit-data workload stays constant —
  * the measured growth then reflects the ALGORITHM's scaling, not an
  * artifact of the derivation:
  *
  *   - `documents`: replica k > 0 suffixes every alphanumeric token with
  *     a replica tag (`$0zk`). Intra-replica duplicate structure is
  *     preserved exactly (same rewrite applied to near-identical texts),
  *     while cross-replica shingles/minhash/simhash/digests can never
  *     match — duplicate-pair density per document stays constant. A
  *     verbatim 16× copy would instead give every doc 16 exact twins and
  *     inflate candidate pairs by r² BY CONSTRUCTION, which is the wrong
  *     experiment.
  *   - `embeddings`: replica k flips each dimension's sign by a
  *     deterministic md5("flip_k_i") bit. Flipping ~half the coordinates
  *     of both vectors of a random pair re-randomizes their angle, so
  *     cross-replica cosines stay near 0 (no spurious ≥ τ pairs for the
  *     exact-quadratic / LSH paths), while each replica keeps the base
  *     distribution.
  *   - `lineitem`/`orders`: l_orderkey/o_orderkey offset by k·10⁷ —
  *     orders:lineitem multiplicity and the o_custkey fan-in to the FIXED
  *     dimensions grow linearly, like a real fact-table append.
  *   - `events`: event_id/user_id offset (new users ⇒ as-of/window key
  *     cardinality grows linearly; per-key series length constant). `ts`
  *     is carried through in whatever encoding the source dir stores
  *     (nanos-as-long / MICROS-NTZ / MICROS — all three have shipped;
  *     `Tables.normalizeEventTs` branches on the stored type either way).
  *   - dims (`region nation customer supplier part`): verbatim — at 100 TB
  *     the facts grow, the dimensions don't.
  */
object ScaleLadder {
  /** Replica key offset for a table family: the next power of 10 past the
    * largest base key. A FIXED offset silently collides once base keys
    * reach it (sf ≈ 7 lineitem orderkeys pass 10⁷), merging cross-replica
    * keys and corrupting the ladder's multiplicity invariants — so the
    * offset is derived from the data. Families whose keys join each other
    * (lineitem ⋈ orders) must share ONE offset or the join multiplicity
    * itself breaks; that is why this takes the max over the whole family. */
  private def offsetPast(maxKey: Long): Long = {
    require(maxKey >= 0, s"negative key $maxKey in ladder base")
    var off = 10_000_000L
    while (off <= maxKey) off *= 10
    off
  }

  private def maxOf(table: String, df: DataFrame, cols: String*): Long = {
    val aggs = cols.map(c => max(col(c)).cast("long"))
    val top = if (aggs.size == 1) aggs.head else greatest(aggs: _*)
    val row = df.select(top).collect()(0)
    // max() over an empty (or all-null) base is null — fail with the table
    // and columns named, not an NPE from getLong.
    require(!row.isNullAt(0),
      s"ladder base table '$table' has no rows (or all-null ${cols.mkString("/")}); " +
        "cannot derive a replica key offset")
    row.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleLadder <baseSfDir> <outDir> <r>")
    val Array(base, out, rStr) = args
    val r = rStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")

    def replicate(df: DataFrame, k2df: Int => DataFrame): DataFrame =
      (0 until r).map(k2df).reduce(_ unionByName _)

    // dims verbatim
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      write(Tables.load(spark, base, n), n, 1)
    }

    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val ord = spark.read.parquet(s"$base/orders.parquet")
    // lineitem and orders JOIN on orderkey — one shared offset for the pair
    val ordOff = offsetPast(math.max(maxOf("lineitem", li, "l_orderkey"), maxOf("orders", ord, "o_orderkey")))
    write(replicate(li, k => li.withColumn("l_orderkey", col("l_orderkey") + lit(k * ordOff))),
      "lineitem", 4 * r)
    write(replicate(ord, k => ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * ordOff))),
      "orders", r)

    // events: read RAW (nanos-as-long when the source is NANOS) so the
    // derived file keeps the source's ts encoding bit-for-bit
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$base/events.parquet")
    val evOff = offsetPast(maxOf("events", ev, "event_id", "user_id"))
    write(replicate(ev, k => ev
      .withColumn("event_id", col("event_id") + lit(k * evOff))
      .withColumn("user_id", col("user_id") + lit(k * evOff))),
      "events", r)

    val docs = spark.read.parquet(s"$base/documents.parquet")
    val docOff = offsetPast(maxOf("documents", docs, "doc_id"))
    write(replicate(docs, k =>
      if (k == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(k * docOff))
        .withColumn("text", regexp_replace(col("text"), "[A-Za-z0-9]+", "$0z" + k))
        .withColumn("n_chars", length(col("text")))),
      "documents", 2 * r)

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val embOff = offsetPast(maxOf("embeddings", emb, "vec_id"))
    def flip(k: Int) = emb
      .withColumn("vec_id", col("vec_id") + lit(k * embOff))
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(conv(substring(md5(concat(lit(s"flip_${k}_"), i.cast("string"))), 1, 1), 16, 10)
            .cast("long") % 2 === 1, x).otherwise(-x)))
    write(replicate(emb, k => if (k == 0) emb else flip(k)), "embeddings", r)

    println(s"""{"scaled": "$out", "r": $r}""")
    spark.stop()
  }
}
