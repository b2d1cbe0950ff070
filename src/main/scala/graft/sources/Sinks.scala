package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Parquet write with WRITE-TIME BLOOM FILTERS on the named columns —
    * the third standard skip mechanism, completing the layout trilogy
    * ([[writeSorted]] = leading-column min/max skip, [[writeZOrder]] =
    * two-dimensional box skip, this = POINT-LOOKUP skip on a
    * high-cardinality column the layout is NOT sorted by).
    *
    * Why it exists: min/max statistics prune a row group only when the
    * probe value falls outside its [min,max] — on a column whose values
    * are scattered (a foreign key, a content digest), every row group
    * spans nearly the full domain and stats skip NOTHING. A split-block
    * bloom filter (parquet-mr's SBBF) instead answers "is value X
    * definitely absent from this row group?" — at 100 TB, an equality
    * probe on a 20-byte digest column then reads the handful of row
    * groups that can match instead of the whole corpus, for ~1% file
    * overhead. `expectedNdv` sizes each filter (bits ∝ ndv for the ~1%
    * FP target): pass the PER-ROW-GROUP distinct count, not the global
    * one. Small `rowGroupBytes` sharpens skip resolution exactly as in
    * [[writeSorted]]. BloomSkipProbe measures the delta; SCALE.md
    * carries the numbers.
    *
    * Dictionary interplay (measured, r14): parquet-mr writes NO bloom
    * filter for a row group whose column stayed fully
    * dictionary-encoded — the dictionary page already gives exact
    * row-group filtering, so the bloom would be redundant bytes. A
    * bloom column is therefore written PLAIN-encoded here: the column
    * you want a bloom on is precisely one whose production cardinality
    * overflows the dictionary page (where parquet falls back to plain
    * and the bloom is the only skip mechanism); keeping the dictionary
    * at test scale would mask exactly the regime the feature exists
    * for — and silently drop the requested filters. */
  def writeWithBloom(df: DataFrame, path: String,
      bloomCols: Seq[(String, Long)],
      rowGroupBytes: Long = 1L << 20): Unit = {
    val w = df.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
    bloomCols.foldLeft(w) { case (acc, (c, ndv)) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
        .option(s"parquet.enable.dictionary#$c", "false")
    }.parquet(path)
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

  /** Before/after footprint of a [[compact]] run. */
  final case class CompactionReport(filesIn: Long, bytesIn: Long,
      filesOut: Long, bytesOut: Long)

  private def parquetStats(spark: SparkSession, path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var files = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { files += 1; bytes += f.getLen }
    }
    (files, bytes)
  }

  /** Small-file compaction: rewrite a fragmented parquet directory into
    * ~`targetBytes`-sized files, preserving any Hive partition layout.
    *
    * Why this exists: streaming ingest ([[streamToParquet]]) and dynamic
    * partition refresh ([[overwritePartitions]]) both emit one file per
    * task per trigger — after a day of 1-minute triggers a partition
    * holds thousands of KB-sized files, and at 100 TB the NameNode/object
    * listing and per-file open cost come to dominate every scan.
    * Compaction is the standard maintenance pass (Delta/Iceberg
    * OPTIMIZE): re-bin the same bytes into few large files.
    *
    * Shapes: the FLAT path is shuffle-free — the scan itself bins small
    * files into splits, and `coalesce` merges those splits without an
    * exchange, so compaction moves each byte exactly once. The
    * PARTITIONED path pays one exchange keyed on (partitionCols, salt) so
    * every output partition directory gets `ceil(avgBytes/target)` writer
    * tasks → that many output files; the salt is a deterministic row hash,
    * so the file count is stable across retries. Writes go to `outPath`
    * (no in-place rename: not atomic on object stores — callers swap
    * pointers, the table-format way). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20,
      partitionCols: Seq[String] = Nil): CompactionReport = {
    import org.apache.spark.sql.functions._
    val (filesIn, bytesIn) = parquetStats(spark, inPath)
    val df = spark.read.parquet(inPath)
    val totalSlots = math.max(1L, (bytesIn + targetBytes - 1) / targetBytes)
    if (partitionCols.isEmpty) {
      df.coalesce(totalSlots.toInt).write.mode("overwrite").parquet(outPath)
    } else {
      // low-cardinality by the writePartitioned contract, so this count
      // is bounded by the partition count, never by rows
      val nVals = math.max(1L, df.select(partitionCols.map(col): _*).distinct().count())
      val perPart = math.max(1L, (totalSlots + nVals - 1) / nVals).toInt
      val dataCols = df.columns.filterNot(partitionCols.contains).map(col)
      val keys = partitionCols.map(col) :+ pmod(hash(dataCols: _*), lit(perPart))
      df.repartition((nVals * perPart).toInt, keys: _*)
        .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(outPath)
    }
    val (filesOut, bytesOut) = parquetStats(spark, outPath)
    CompactionReport(filesIn, bytesIn, filesOut, bytesOut)
  }

  /** Z-order (Morton) layout write: bit-interleave two non-negative
    * integer sort keys and lay the data out along the space-filling
    * curve (Morton 1966; the Delta/Iceberg OPTIMIZE ZORDER idea, built
    * here from plain codegen'd bit ops — no UDF).
    *
    * Why this exists: [[writeSorted]] gives file- and row-group-level
    * skipping on the LEADING sort column only — a predicate on the
    * second column alone prunes nothing, because every row group spans
    * its full range. The z-curve keeps each stored run LOCAL IN BOTH
    * dimensions, so each row group's footer [min,max] is a small box in
    * (c1, c2) space and predicates on either column — or both — skip
    * groups (ZOrderSpec measures exactly this delta vs the linear sort).
    *
    * At 100 TB this is the layout dial for the two-dimensional access
    * pattern (e.g. corpus shards probed by both source and date, facts
    * probed by both part and supplier): one write-time decision buys
    * pushdown-driven pruning for BOTH predicate families, where a linear
    * sort forces you to pick one.
    *
    * `bits1`/`bits2` are each key's domain width (values must fit, i.e.
    * 0 ≤ v < 2^bits; bits1+bits2 ≤ 63). The interleave is MSB-FIRST:
    * bit k-from-top of each dimension alternates from the top of z, and
    * when the narrower dimension runs out the wider one's remaining low
    * bits fill the tail. Unequal widths therefore stay BALANCED — a
    * contiguous z-run is a box whose side lengths shrink together in
    * *significant* bits of each key, instead of the naive LSB interleave
    * that lets the wider domain's high bits dominate and stretches every
    * box across the narrow dimension's whole range. */
  def writeZOrder(df: DataFrame, path: String, c1: String, c2: String,
      bits1: Int = 21, bits2: Int = 21, rowGroupBytes: Long = 1L << 20): Unit = {
    import org.apache.spark.sql.functions._
    require(bits1 + bits2 <= 63, s"z key too wide: $bits1+$bits2")
    val x = col(c1).cast("long")
    val y = col(c2).cast("long")
    // (source column, source bit) in output order, MSB of z first
    val layout: Seq[(org.apache.spark.sql.Column, Int)] =
      (0 until math.max(bits1, bits2)).flatMap { k =>
        (if (k < bits1) Seq((x, bits1 - 1 - k)) else Nil) ++
          (if (k < bits2) Seq((y, bits2 - 1 - k)) else Nil)
      }
    val total = bits1 + bits2
    val z = layout.zipWithIndex.map { case ((src, b), i) =>
      shiftleft(shiftrightunsigned(src, b).bitwiseAND(lit(1L)), total - 1 - i)
    }.reduce(_ bitwiseOR _)
    df.withColumn("_graft_z", z)
      .repartitionByRange(col("_graft_z"))
      .sortWithinPartitions(col("_graft_z"))
      .drop("_graft_z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }
}
