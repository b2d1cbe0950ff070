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
}
