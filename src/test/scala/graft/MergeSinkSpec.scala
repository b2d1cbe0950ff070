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

    // shape 2: crash AFTER the v=2 snapshot write but BEFORE the commit —
    // the replay must rewrite v=2 from the same committed parent and land
    // on the identical snapshot
    val b2 = ev.where(col("user_id") % 3 === 0)
    MergeSink.applyBatch(sink)(b2, 2L)
    val afterB2 = MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq
    // delete b2's commit record (simulated crash before commit), then replay
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val (topSlot, topTok) = MergeSink.commitChain(spark, sink).last
    assert(topTok == "w0-2")
    fs.delete(new org.apache.hadoop.fs.Path(sink, f"commit-$topSlot%09d"), false)
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

  /** Files under the bucket leaf dirs of version token v, per bucket. */
  private def bucketFiles(sink: String): Map[(Int, String), Set[String]] = {
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val root = new org.apache.hadoop.fs.Path(sink)
    fs.listStatus(root).filter(_.getPath.getName.startsWith("v=")).flatMap { vd =>
      val v = vd.getPath.getName.stripPrefix("v=")
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
    val manifest0 = MergeSink.readManifest(spark, sink, "w0-0")
    assert(manifest0.size > 1, "seed batch must populate multiple buckets")
    val before = bucketFiles(sink)

    // delta confined to ONE user -> exactly one bucket
    val oneUser = ev.orderBy("user_id").limit(1).collect()(0).getLong(0)
    MergeSink.applyBatch(sink)(ev.where(col("user_id") === oneUser), 1L)

    val manifest1 = MergeSink.readManifest(spark, sink, "w0-1")
    val moved = manifest1.filter { case (b, v) => manifest0.get(b) != Some(v) }
    assert(moved.size == 1, s"exactly one bucket must move, got $moved")
    assert(moved.values.toSet == Set("w0-1"))
    // physical check: every v=0 bucket file is untouched (name+mtime+len),
    // and v=1 holds exactly the one moved bucket
    val after = bucketFiles(sink)
    before.foreach { case (k, files) => assert(after(k) == files, s"$k rewritten") }
    assert(after.keys.count(_._2 == "w0-1") == 1)
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
    // versions 1..3 are still referenced by manifest-w0-3 (their buckets
    // are current); v=w0-0 survives too IF any bucket still points there —
    // so the only deletable versions are those fully superseded. With 3
    // distinct users hashing to <=3 buckets of 64, v=w0-0 keeps
    // unsuperseded buckets and nothing is deletable unless all its buckets
    // moved.
    val manifest3 = MergeSink.readManifest(spark, sink, "w0-3")
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
    assert(manifests == Set("manifest-w0-3"))

    // now FULLY supersede: re-merge every user so every bucket moves to
    // v=w0-4, then vacuum must delete all prior versions
    MergeSink.applyBatch(sink)(ev, 4L)
    val full = MergeSink.snapshotTotals(spark, sink).orderBy("user_id").collect().toSeq
    val deleted2 = MergeSink.vacuum(spark, sink, keepLast = 1)
    assert(deleted2.nonEmpty, "fully superseded versions must be deleted")
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(sink))
      .map(_.getPath.getName).filter(_.startsWith("v=")).toSet
    assert(dirs == Set("v=w0-4"))
    assert(MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq == full)
  }

  test("two interleaved writers converge to the serial answer, no lost buckets") {
    val sink = java.nio.file.Files.createTempDirectory("graft_m2w_").toString
    val ev = Tables.events(spark, sf0).select(col("user_id"), col("value"))
    val a0 = ev.where(col("user_id") % 4 === 0)
    val a1 = ev.where(col("user_id") % 4 === 1)
    val b0 = ev.where(col("user_id") % 4 === 2)
    val b1 = ev.where(col("user_id") % 4 === 3)

    // interleave the two writers' batches against ONE snapshot dir — each
    // commit must chain off the other's, dropping nothing
    MergeSink.applyBatch(sink, "wa")(a0, 0L)
    MergeSink.applyBatch(sink, "wb")(b0, 0L)
    MergeSink.applyBatch(sink, "wa")(a1, 1L)
    MergeSink.applyBatch(sink, "wb")(b1, 1L)

    // the chain records all four commits, in order, with dense slots
    val chain = MergeSink.commitChain(spark, sink)
    assert(chain.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(chain.map(_._2) == Seq("wa-0", "wb-0", "wa-1", "wb-1"))

    // cross-writer replays are writer-scoped: wa-0 replay is a no-op even
    // though wb has committed SINCE
    val committed = MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq
    MergeSink.applyBatch(sink, "wa")(a0, 0L)
    MergeSink.applyBatch(sink, "wb")(b0, 0L)
    assert(MergeSink.commitChain(spark, sink) == chain)
    assert(MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq == committed)

    // the merged totals equal one serial batch aggregation over ALL rows
    val expect = ev
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy("user_id").collect().toSeq
    assert(committed == expect)
  }

  test("a commit race loser re-merges against the winner: both deltas survive") {
    val sink = java.nio.file.Files.createTempDirectory("graft_mrace_").toString
    val ev = Tables.events(spark, sf0).select(col("user_id"), col("value"))
    MergeSink.applyBatch(sink, "wa")(ev, 0L) // seed: head = slot 0 ("wa-0")
    // force a LOST RACE deterministically: wb will read head slot 0 and
    // target slot 1 — pre-claim slot 1 on behalf of a racer "wx" whose
    // manifest is a copy of the current head's (an empty delta). wb's
    // first tryCommit must fail, and its retry must re-merge against
    // wx-0's manifest and land on slot 2.
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val headManifest = MergeSink.readManifest(spark, sink, "wa-0")
    val mf = fs.create(new org.apache.hadoop.fs.Path(sink, "manifest-wx-0"), true)
    mf.write(headManifest.toSeq.sorted
      .map { case (b, t) => s"$b $t" }.mkString("\n").getBytes("UTF-8"))
    mf.close()
    val slot = fs.create(new org.apache.hadoop.fs.Path(sink, "commit-000000001"), false)
    slot.write("wx-0".getBytes("UTF-8")); slot.close()

    MergeSink.applyBatch(sink, "wb")(ev, 0L) // loses slot 1, retries, wins slot 2
    val chain = MergeSink.commitChain(spark, sink)
    assert(chain == Seq(0L -> "wa-0", 1L -> "wx-0", 2L -> "wb-0"),
      s"loser must land AFTER the pre-claimed slot, got $chain")
    // every user's totals are exactly DOUBLE the one-pass aggregation
    // (wa merged ev once, wb merged ev again; wx added nothing) — i.e.
    // wb's re-merge preserved BOTH wa's buckets and its own delta
    val got = MergeSink.snapshotTotals(spark, sink)
      .orderBy("user_id").collect().toSeq
    val expect = ev.groupBy("user_id")
      .agg((count(lit(1)) * 2).as("n"),
        (sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double") * 2).as("sum_value"))
      .orderBy("user_id").collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1))) ==
      expect.map(r => (r.getLong(0), r.getLong(1))))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g.getDouble(2) - e.getDouble(2)) < 1e-9)
    }
  }
}
