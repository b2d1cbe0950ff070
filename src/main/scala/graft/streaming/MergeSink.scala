package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Exactly-once streaming MERGE sink over an INCREMENTAL, hash-bucketed
  * snapshot — the piece a production ingest actually deploys on top of
  * the batch MERGE operator
  * ([[graft.operators.AdvancedQueries.cdcApply]]-family upserts).
  *
  * Structured Streaming guarantees AT-LEAST-ONCE delivery to
  * `foreachBatch`: after a crash between sink write and checkpoint
  * commit, the SAME micro-batch (same `batchId`, same rows) is replayed.
  * Exactly-once therefore has to come from the SINK being idempotent on
  * `batchId` — the documented contract ("use batchId to deduplicate").
  * This sink makes replays provably convergent AND keeps per-batch cost
  * proportional to the DELTA, not the accumulated snapshot (the r14
  * full-snapshot-rewrite scale-killer, fixed):
  *
  *   - the snapshot is HASH-PARTITIONED into [[Buckets]] buckets by
  *     `pmod(hash(user_id), Buckets)` (Spark's Murmur3 `hash` — stable
  *     across runs/partitionings, so a key's bucket never moves);
  *   - batch b aggregates its delta (one map-side-combined shuffle of the
  *     BATCH only), derives the delta's TOUCHED bucket set (≤ Buckets
  *     driver-side ints — bounded, never data rows), reads ONLY those
  *     buckets' current files, merges, and writes the result in ONE job
  *     under `v=b/p=NN/` via `partitionBy` — untouched buckets are never
  *     read, never rewritten;
  *   - a MANIFEST (`manifest-b`, one `bucket version` line per bucket
  *     that has data) maps every bucket to the version directory holding
  *     its current rows: touched buckets point at `b`, untouched buckets
  *     keep their prior pointer — so a snapshot read unions ≤ Buckets
  *     leaf paths and a batch's write amplification is
  *     |touched buckets| / Buckets of the snapshot, ∝ |delta| for sparse
  *     deltas;
  *   - a batch COMMITS by atomically rewriting the `_latest` pointer file
  *     to `b` — readers resolve pointer → manifest → leaf paths, so a
  *     crash mid-write leaves dangling uncommitted files, never a torn
  *     snapshot (the minimal file-based analogue of a table format's
  *     transaction log; object-store deployments swap this for
  *     Delta/Iceberg commits, same protocol);
  *   - a REPLAYED batch (`batchId ≤` committed version) is skipped
  *     entirely; a replay of an UNCOMMITTED batch recomputes the same
  *     touched set from the same committed parent manifest and rewrites
  *     `v=b/` with mode=overwrite — identical snapshot content either way.
  *     MergeSinkSpec proves both replay shapes leave the snapshot
  *     unchanged, and that a 1-bucket delta rewrites exactly 1 bucket;
  *   - superseded bucket files accumulate one version dir per batch until
  *     [[vacuum]] deletes every `v=*` directory the last `keepLast`
  *     committed manifests no longer reference (post-vacuum snapshot
  *     equality is spec-locked) — bounded storage without breaking
  *     time-travel to the retained manifests.
  *
  * The merge itself is ADDITIVE (per-key count + integer-cents sum), so
  * the final snapshot is independent of how rows split across
  * micro-batches — which is what lets the finite-input streaming run be
  * oracle-checked against plain batch GROUP BY SQL. Scale shape: per
  * batch, one delta shuffle ∝ |batch|, one join against the touched
  * buckets only (both sides hash-partitioned on the key), one
  * partitionBy write of the touched buckets; driver holds only the
  * bucket-id set. A 100 TB snapshot with a 1-bucket delta reads and
  * writes 1/[[Buckets]] of the data; at cluster scale Buckets rises with
  * the snapshot (it is a constructor knob) keeping per-batch cost flat.
  */
object MergeSink {

  /** Snapshot bucket count. 64 keeps the touched-set driver list trivial
    * and bucket files comfortably sized at test scale; a 100 TB
    * deployment raises it (bucket count only changes file layout, not
    * results — the spec's split-invariance holds for any value). */
  val Buckets: Int = 64

  /** Snapshot schema: per-user event count + exact integer-cents total
    * (long adds are associative+commutative, so the merged totals are
    * independent of batch split and row order — the property the oracle
    * check rides on). */
  val snapshotSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("n", LongType),
    StructField("cents", LongType)))

  /** The stable bucket of a key: Murmur3 `hash` (seed 42, Spark's
    * default) mod [[Buckets]] — deterministic across sessions, so a
    * user's rows land in the same bucket forever. */
  private def bucketCol = pmod(hash(col("user_id")), lit(Buckets))

  private def hadoopFs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** The committed version (batchId) the `_latest` pointer names, if any. */
  def committedVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, p) = hadoopFs(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(p, "_latest")
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  private def commitVersion(spark: SparkSession, dir: String, v: Long): Unit = {
    val (fs, p) = hadoopFs(spark, dir)
    val out = fs.create(new org.apache.hadoop.fs.Path(p, "_latest"), true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The manifest of version `v`: bucket → version dir holding that
    * bucket's current rows. One `bucket version` line per bucket with
    * data; buckets never written are absent. */
  def readManifest(spark: SparkSession, dir: String, v: Long): Map[Int, Long] = {
    val (fs, p) = hadoopFs(spark, dir)
    val mf = new org.apache.hadoop.fs.Path(p, s"manifest-$v")
    if (!fs.exists(mf)) return Map.empty
    val in = fs.open(mf)
    try {
      val txt = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      txt.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map { line =>
        val Array(b, ver) = line.split(" ")
        b.toInt -> ver.toLong
      }.toMap
    } finally in.close()
  }

  private def writeManifest(spark: SparkSession, dir: String, v: Long,
      m: Map[Int, Long]): Unit = {
    val (fs, p) = hadoopFs(spark, dir)
    val out = fs.create(new org.apache.hadoop.fs.Path(p, s"manifest-$v"), true)
    // sorted for deterministic bytes (replay byte-identity)
    val txt = m.toSeq.sorted.map { case (b, ver) => s"$b $ver" }.mkString("\n")
    try out.write(txt.getBytes("UTF-8")) finally out.close()
  }

  /** Leaf parquet paths of the buckets `m` names, optionally restricted
    * to a bucket subset. */
  private def bucketPaths(dir: String, m: Map[Int, Long],
      only: Option[Set[Int]] = None): Seq[String] =
    m.toSeq.collect {
      case (b, ver) if only.forall(_.contains(b)) => s"$dir/v=$ver/p=$b"
    }.sorted

  /** The last COMMITTED snapshot (empty frame with [[snapshotSchema]]
    * before the first commit). Readers resolve pointer → manifest →
    * bucket leaf dirs; uncommitted versions are invisible. */
  def readSnapshot(spark: SparkSession, dir: String): DataFrame =
    committedVersion(spark, dir) match {
      case Some(v) =>
        val paths = bucketPaths(dir, readManifest(spark, dir, v))
        if (paths.isEmpty) emptySnapshot(spark)
        else spark.read.schema(snapshotSchema).parquet(paths: _*)
      case None => emptySnapshot(spark)
    }

  private def emptySnapshot(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snapshotSchema)

  /** The idempotent per-batch MERGE: skip already-committed batchIds,
    * otherwise merge the batch's additive delta into ONLY the buckets it
    * touches, write them under `v=batchId/p=NN/` in one job, publish a
    * manifest carrying untouched buckets forward, and commit the pointer.
    * Public so the spec can replay batches directly against a sink
    * directory. */
  def applyBatch(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (committedVersion(spark, dir).exists(batchId <= _)) return // replayed: already merged
    val delta = batch
      .select(col("user_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("dn"), sum(col("c")).as("dcents"))
    // the touched bucket set: ≤ Buckets ints on the driver, never rows
    val touched = delta.select(bucketCol.as("p")).distinct()
      .collect().map(_.getInt(0)).toSet
    val parent = committedVersion(spark, dir)
      .map(readManifest(spark, dir, _)).getOrElse(Map.empty)
    if (touched.nonEmpty) {
      // read ONLY the touched buckets' current rows — the incremental core
      val basePaths = bucketPaths(dir, parent, Some(touched))
      val base =
        if (basePaths.isEmpty) emptySnapshot(spark)
        else spark.read.schema(snapshotSchema).parquet(basePaths: _*)
      val merged = base.join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("cents"), lit(0L)) + coalesce(col("dcents"), lit(0L))).as("cents"))
      merged.withColumn("p", bucketCol)
        .repartition(col("p")) // co-locate each bucket into one task's files
        .write.partitionBy("p").mode("overwrite").parquet(s"$dir/v=$batchId")
    }
    val manifest = parent ++ touched.map(_ -> batchId)
    writeManifest(spark, dir, batchId, manifest)
    commitVersion(spark, dir, batchId)
  }

  /** Delete every `v=*` directory that none of the last `keepLast`
    * committed manifests reference (and every manifest older than those),
    * bounding storage at `keepLast` versions of retained time-travel.
    * The CURRENT snapshot is untouched by construction — its manifest is
    * always among the retained set. Returns the deleted version ids. */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "keepLast must retain at least the current version")
    val committed = committedVersion(spark, dir).getOrElse(return Nil)
    val (fs, p) = hadoopFs(spark, dir)
    val manifests = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("manifest-")).map(_.stripPrefix("manifest-").toLong)
      .filter(_ <= committed).sorted
    val retainedIds = manifests.takeRight(keepLast)
    val referenced: Set[Long] = retainedIds
      .flatMap(v => readManifest(spark, dir, v).values).toSet ++ retainedIds
    val versionDirs = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.startsWith("v="))
    val doomed = versionDirs
      .map(d => (d, d.getName.stripPrefix("v=").toLong))
      .filter { case (_, v) => v <= committed && !referenced.contains(v) }
    doomed.foreach { case (d, _) => fs.delete(d, true) }
    manifests.dropRight(keepLast).foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(p, s"manifest-$v"), false))
    doomed.map(_._2).sorted.toSeq
  }

  /** Run the events stream through the MERGE sink to completion and read
    * back the committed snapshot as (user_id, n, sum_value) — the shape
    * the batch GROUP BY oracle checks. */
  def mergedTotals(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None,
      checkpoint: Option[String] = None): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_").toString
    val src = EventStreams.readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .select(col("user_id"), col("value"))
    val w = src.writeStream
      .foreachBatch { (b: DataFrame, id: Long) => applyBatch(dir)(b, id) }
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    val q = w.start()
    q.awaitTermination()
    snapshotTotals(spark, dir)
  }

  /** Read a sink directory's committed snapshot as the user-facing
    * (user_id, n, sum_value) frame. */
  def snapshotTotals(spark: SparkSession, dir: String): DataFrame =
    readSnapshot(spark, dir)
      .select(col("user_id"), col("n"), (col("cents") / 100.0).as("sum_value"))
}
