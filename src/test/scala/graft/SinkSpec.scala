package graft

import graft.core.Tables
import java.nio.file.Files
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Sink surface for the pipeline extensions (the LazyFrame parity surface
  * stays read-only, like the reference): partitioned parquet output is the
  * standard shape for training-data shards — one directory per partition
  * key, so downstream readers prune whole shards by predicate.
  */
class SinkSpec extends SparkSpec {

  test("partitioned parquet write: readers prune non-matching partitions") {
    val dir = Files.createTempDirectory("graft_sink_").toString
    val docs = Tables.documents(spark, sf0)
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)

    // read back one shard by predicate: values round-trip
    val back = spark.read.parquet(dir)
    val want = docs.where(col("lang") === "en").select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val got = back.where(col("lang") === "en").select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == want && got.nonEmpty)

    // the partition predicate must prune at planning time (PartitionFilters),
    // not surface as a data filter over all shards
    val plan = back.where(col("lang") === "en")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"partition pruning not visible:\n$plan")
  }

  test("compact (flat): shuffle-free re-bin to ceil(bytes/target) files, values intact") {
    val in = Files.createTempDirectory("graft_frag_").toString
    val out = Files.createTempDirectory("graft_compact_").toString
    val docs = Tables.documents(spark, sf0)
    docs.repartition(50).write.mode("overwrite").parquet(in)

    val target = 256L << 10
    val rep = graft.sources.Sinks.compact(spark, in, out, targetBytes = target)
    assert(rep.filesIn === 50)
    val expectOut = math.max(1L, (rep.bytesIn + target - 1) / target)
    assert(rep.filesOut === expectOut,
      s"expected $expectOut files for ${rep.bytesIn} B at $target B target, got ${rep.filesOut}")
    assert(rep.filesOut < rep.filesIn)

    val want = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val got = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "compaction must move bytes, not change them")
  }

  test("compact (partitioned): layout preserved, per-partition file count collapses") {
    val in = Files.createTempDirectory("graft_fragp_").toString
    val out = Files.createTempDirectory("graft_compactp_").toString
    val docs = Tables.documents(spark, sf0)
    docs.repartition(40).write.mode("overwrite").partitionBy("lang").parquet(in)

    val rep = graft.sources.Sinks.compact(spark, in, out,
      targetBytes = 1L << 30, partitionCols = Seq("lang"))
    val langs = docs.select("lang").distinct().count()
    assert(rep.filesIn > langs, "fragmented input: many files per lang")
    assert(rep.filesOut === langs, "one ≥target-sized slot per partition value")

    // partition layout survives: pruning still works on the compacted copy
    val back = spark.read.parquet(out)
    val plan = back.where(col("lang") === "en")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
    val want = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val got = back.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.sameElements(want))
  }

  test("streaming sink: windowed aggregate appends to partitioned parquet") {
    val dir = Files.createTempDirectory("graft_stream_sink_").toString
    val agg = graft.streaming.EventStreams.tumbling(
      graft.streaming.EventStreams.readStream(spark, sf0), "1 day")
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", s"$dir/_chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // append mode emits only watermark-closed windows; the finite input
    // closes all but the final watermark frontier
    val n = spark.read.parquet(dir).count()
    assert(n > 0)
  }

  test("dynamic partition overwrite: refresh one shard, siblings untouched") {
    val dir = Files.createTempDirectory("graft_dpo_").toString
    val docs = Tables.documents(spark, sf0)
      .select(col("doc_id"), col("n_chars"), col("source"))
    graft.sources.Sinks.writePartitioned(docs, dir, Seq("source"))

    // refresh ONLY src0 with bumped payloads
    val refreshed = docs.where(col("source") === "src0")
      .withColumn("n_chars", col("n_chars") + 1000000L)
    graft.sources.Sinks.overwritePartitions(refreshed, dir, Seq("source"))

    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count(), "row count preserved across refresh")
    assert(back.where(col("source") === "src0")
      .agg(min(col("n_chars"))).head.getLong(0) >= 1000000L,
      "refreshed shard must carry the new payload")
    val untouchedWant = docs.where(col("source") === "src3")
      .select("doc_id", "n_chars").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val untouchedGot = back.where(col("source") === "src3")
      .select("doc_id", "n_chars").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(untouchedGot === untouchedWant, "sibling partitions must be untouched")
  }
}
