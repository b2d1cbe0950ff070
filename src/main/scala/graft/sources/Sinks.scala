package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Sink surface for the pipeline extensions. The LazyFrame parity surface
  * stays READ-ONLY like the reference ("File frames are read-only.",
  * `/root/reference/R/lazy.frame.R:121-124`); these sinks are for the
  * training-data pipeline outputs.
  *
  * Shapes and why they scale:
  *   - partitioned parquet: one directory per partition value — readers
  *     prune whole shards at planning time (`PartitionFilters`), the
  *     standard layout for corpus shards keyed by lang/source/date;
  *   - bucketed table: co-bucketing both sides of a recurring equi-join
  *     key eliminates its shuffle on every later join (BucketingSpec
  *     proves the joint read is exchange-free);
  *   - streaming parquet: append-mode with a checkpoint — exactly-once
  *     file output for watermark-closed windows.
  */
object Sinks {

  /** Batch write, one directory per `partitionCols` value combination.
    * Choose low-cardinality keys (lang, source, date) — thousands of
    * partitions, not millions; high-cardinality layout belongs in
    * bucketing. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table: later equi-joins/aggregations on
    * `bucketCol` between co-bucketed tables read shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Streaming append to partitioned parquet with checkpointing; returns
    * the started query (caller awaits/stops). `AvailableNow` drains the
    * current input and terminates — swap the trigger for continuous
    * ingest. */
  def streamToParquet(df: DataFrame, path: String, checkpoint: String,
      partitionCols: Seq[String] = Nil): StreamingQuery = {
    val w = df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).start()
  }

  /** Sorted-layout parquet write: range-partition on `sortCols`, sort
    * within partitions, and cap the parquet row-group size so each file
    * holds MANY row groups with tight, mostly-disjoint column statistics.
    *
    * Why this exists (r12 verdict #5): predicate pushdown can only SKIP
    * row groups whose min/max excludes the filter value — and the
    * as-shipped harness layout (one 600 K-row row group, every value
    * present in it) makes zero skipping possible no matter how good the
    * reader is. Locality is a WRITE-time decision. After this write, an
    * equality/range filter on a leading sort column prunes whole row
    * groups from the scan (SortedLayoutSpec proves the footer stats are
    * disjoint; SCALE.md carries the measured before/after).
    *
    * At 100 TB the same dial is the difference between "scan everything"
    * and "scan the one shard range that can match": repartitionByRange
    * gives globally non-overlapping file ranges (file-level skip via
    * footer min/max), the within-partition sort gives row-group-level
    * skip inside each file. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
      rowGroupBytes: Long = 1L << 20): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    df.repartitionByRange(cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }

  /** Dynamic partition overwrite: replace ONLY the partitions present in
    * `df`, leaving sibling partitions untouched — the incremental corpus
    * refresh shape (re-ingest one source/day without rewriting the other
    * 99.9% of a 100 TB layout; static overwrite mode would drop every
    * partition first). Conf is set per-call and restored. */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val old = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally spark.conf.set(key, old)
  }
}
