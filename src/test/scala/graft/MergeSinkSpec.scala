package graft

import graft.core.Tables
import graft.streaming.MergeSink
import org.apache.spark.sql.functions._

/** Exactly-once contract of the streaming MERGE sink: multi-batch
  * convergence to the batch answer, and idempotence under both replay
  * shapes foreachBatch can deliver (already-committed batch re-delivered;
  * crash-between-write-and-commit re-delivered). */
class MergeSinkSpec extends SparkSpec {

  private def batchAnswer = Tables.events(spark, sf0)
    .groupBy("user_id")
    .agg(count(lit(1)).as("n"),
      sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("sum_value"))
    .orderBy("user_id").collect().toSeq

  test("multi-batch streaming MERGE converges to the batch GROUP BY") {
    val dir = java.nio.file.Files.createTempDirectory("graft_msrc_").toString
    Tables.events(spark, sf0).drop("ts_ns")
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val merged = MergeSink.mergedTotals(spark, dir, "part-*.parquet", Some(1))
      .orderBy("user_id").collect().toSeq
    assert(merged == batchAnswer)
  }

  test("replayed committed batch is a no-op; uncommitted replay converges") {
    val sink = java.nio.file.Files.createTempDirectory("graft_msink_").toString
    val ev = Tables.events(spark, sf0).select(col("user_id"), col("value"))
    val b0 = ev.where(col("user_id") % 2 === 0)
    val b1 = ev.where(col("user_id") % 2 === 1)

    MergeSink.applyBatch(sink)(b0, 0L)
    MergeSink.applyBatch(sink)(b1, 1L)
    assert(MergeSink.committedVersion(spark, sink).contains(1L))
    val committed = MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq

    // shape 1: an already-committed batch is re-delivered (checkpoint
    // committed, sink sees the same batchId again) -> skipped entirely
    MergeSink.applyBatch(sink)(b1, 1L)
    MergeSink.applyBatch(sink)(b0, 0L) // even an OLD batchId replay
    assert(MergeSink.committedVersion(spark, sink).contains(1L))
    assert(MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq == committed)

    // shape 2: crash AFTER the v=2 snapshot write but BEFORE the pointer
    // commit — the replay must rewrite v=2 from the same committed parent
    // and land on the identical snapshot
    val b2 = ev.where(col("user_id") % 3 === 0)
    MergeSink.applyBatch(sink)(b2, 2L)
    val afterB2 = MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq
    // roll the pointer back to 1 (simulated torn commit), then replay
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(sink, "_latest"), true)
    out.write("1".getBytes("UTF-8")); out.close()
    MergeSink.applyBatch(sink)(b2, 2L)
    assert(MergeSink.committedVersion(spark, sink).contains(2L))
    assert(MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq == afterB2)

    // the merged totals still equal one-shot batch aggregation over b0∪b1∪b2's rows
    val expect = b0.unionByName(b1).unionByName(b2)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy("user_id").collect().toSeq
    val got = MergeSink.snapshotTotals(spark, sink).orderBy("user_id").collect().toSeq
    assert(got == expect)
  }

  test("readers only ever see committed snapshots (empty before first commit)") {
    val sink = java.nio.file.Files.createTempDirectory("graft_mempty_").toString
    assert(MergeSink.committedVersion(spark, sink).isEmpty)
    assert(MergeSink.snapshotTotals(spark, sink).count() == 0L)
  }

  /** Files under the bucket leaf dirs of version v, per bucket. */
  private def bucketFiles(sink: String): Map[(Int, Long), Set[String]] = {
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val root = new org.apache.hadoop.fs.Path(sink)
    fs.listStatus(root).filter(_.getPath.getName.startsWith("v=")).flatMap { vd =>
      val v = vd.getPath.getName.stripPrefix("v=").toLong
      fs.listStatus(vd.getPath).filter(_.getPath.getName.startsWith("p=")).map { pd =>
        val b = pd.getPath.getName.stripPrefix("p=").toInt
        (b, v) -> fs.listStatus(pd.getPath)
          .map(s => s"${s.getPath.getName}:${s.getModificationTime}:${s.getLen}")
          .toSet
      }
    }.toMap
  }

  test("incremental: a batch touching 1 of 64 buckets rewrites exactly 1 bucket") {
    val sink = java.nio.file.Files.createTempDirectory("graft_mincr_").toString
    val ev = Tables.events(spark, sf0).select(col("user_id"), col("value"))
    MergeSink.applyBatch(sink)(ev, 0L) // seed: all users -> many buckets
    val manifest0 = MergeSink.readManifest(spark, sink, 0L)
    assert(manifest0.size > 1, "seed batch must populate multiple buckets")
    val before = bucketFiles(sink)

    // delta confined to ONE user -> exactly one bucket
    val oneUser = ev.orderBy("user_id").limit(1).collect()(0).getLong(0)
    MergeSink.applyBatch(sink)(ev.where(col("user_id") === oneUser), 1L)

    val manifest1 = MergeSink.readManifest(spark, sink, 1L)
    val moved = manifest1.filter { case (b, v) => manifest0.get(b) != Some(v) }
    assert(moved.size == 1, s"exactly one bucket must move, got $moved")
    assert(moved.values.toSet == Set(1L))
    // physical check: every v=0 bucket file is untouched (name+mtime+len),
    // and v=1 holds exactly the one moved bucket
    val after = bucketFiles(sink)
    before.foreach { case (k, files) => assert(after(k) == files, s"$k rewritten") }
    assert(after.keys.count(_._2 == 1L) == 1)
    // and the merged totals are still exact
    val got = MergeSink.snapshotTotals(spark, sink)
      .where(col("user_id") === oneUser).collect()(0)
    val want = ev.where(col("user_id") === oneUser)
      .agg((count(lit(1)) * 2).as("n"),
        (sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double") * 2).as("s")).collect()(0)
    assert(got.getLong(1) == want.getLong(0))
    assert(math.abs(got.getDouble(2) - want.getDouble(1)) < 1e-9)
  }

  test("vacuum deletes superseded versions only; snapshot unchanged after") {
    val sink = java.nio.file.Files.createTempDirectory("graft_mvac_").toString
    val ev = Tables.events(spark, sf0).select(col("user_id"), col("value"))
    MergeSink.applyBatch(sink)(ev, 0L)
    // three single-user batches: each supersedes one bucket
    val users = ev.select("user_id").distinct().orderBy("user_id")
      .limit(3).collect().map(_.getLong(0))
    users.zipWithIndex.foreach { case (u, i) =>
      MergeSink.applyBatch(sink)(ev.where(col("user_id") === u), i + 1L)
    }
    val committed = MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq

    val deleted = MergeSink.vacuum(spark, sink, keepLast = 1)
    // versions 1..3 are still referenced by manifest-3 (their buckets are
    // current); v=0 survives too IF any bucket still points there — so the
    // only deletable versions are those fully superseded. With 3 distinct
    // users hashing to <=3 buckets of 64, v=0 keeps unsuperseded buckets
    // and nothing is deletable unless all its buckets moved.
    val manifest3 = MergeSink.readManifest(spark, sink, 3L)
    val stillReferenced = manifest3.values.toSet
    assert(deleted.forall(v => !stillReferenced.contains(v)))
    // post-vacuum snapshot identical
    assert(MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq == committed)
    // old manifests are gone; the committed one remains
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val manifests = fs.listStatus(new org.apache.hadoop.fs.Path(sink))
      .map(_.getPath.getName).filter(_.startsWith("manifest-")).toSet
    assert(manifests == Set("manifest-3"))

    // now FULLY supersede: re-merge every user so every bucket moves to v=4,
    // then vacuum must delete all prior versions
    MergeSink.applyBatch(sink)(ev, 4L)
    val full = MergeSink.snapshotTotals(spark, sink).orderBy("user_id").collect().toSeq
    val deleted2 = MergeSink.vacuum(spark, sink, keepLast = 1)
    assert(deleted2.nonEmpty, "fully superseded versions must be deleted")
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(sink))
      .map(_.getPath.getName).filter(_.startsWith("v=")).toSet
    assert(dirs == Set("v=4"))
    assert(MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq == full)
  }
}
