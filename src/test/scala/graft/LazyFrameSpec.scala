package graft

import graft.core.{CsvProbe, LazyFrame}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parity semantics ported from the reference's executable documentation
  * (SURVEY.md §5.1): header autodetection, separators, gzip, skip, typed
  * comparison filters with malformed→no-match, row addressing, metadata. */
class LazyFrameSpec extends SparkSpec {

  private def writeCsv(lines: Seq[String], suffix: String = ".csv"): String = {
    val f = Files.createTempFile("lfspec", suffix)
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  // iris-shaped fixture (the Rd example's filter cardinalities, scaled down)
  private val irisish = Seq(
    "sl,sw,pl,pw,species",
    "5.1,3.5,1.4,0.2,setosa",
    "4.4,2.9,1.4,0.2,setosa", // row 2: sl < 4.5
    "4.9,3.1,1.5,0.1,setosa",
    "4.3,3.0,1.1,0.1,setosa", // row 4: sl < 4.5
    "7.0,3.2,4.7,1.4,versicolor",
    "6.4,3.2,4.5,1.5,versicolor",
    "5.9,3.0,5.1,1.8,virginica")

  test("csv open: header autodetected, schema probed from 5 rows") {
    val lf = LazyFrame.csv(spark, writeCsv(irisish))
    assert(lf.columns == Seq("sl", "sw", "pl", "pw", "species"))
    assert(lf.df.schema("sl").dataType == DoubleType)
    assert(lf.df.schema("species").dataType == StringType)
    assert(lf.dim == (7L, 5))
  }

  test("csv open: headerless file gets V1..Vn names (like read.table)") {
    val lf = LazyFrame.csv(spark, writeCsv(irisish.tail))
    assert(lf.columns == Seq("V1", "V2", "V3", "V4", "V5"))
    assert(lf.nrow == 7L)
  }

  test("csv open: non-comma separator and skip") {
    val lines = Seq("# a comment", "x|y", "1|foo", "2|bar")
    val lf = LazyFrame.csv(spark, writeCsv(lines), sep = "|", skip = 1)
    assert(lf.columns == Seq("x", "y"))
    assert(lf.df.schema("x").dataType == LongType)
    assert(lf.nrow == 2L)
  }

  test("csv open with skip: extraction lineage is a columnar copy, no RDD text rescan") {
    val lines = Seq("# junk line", "x|y", "1|foo", "2|bar")
    val lf = LazyFrame.csv(spark, writeCsv(lines), sep = "|", skip = 1)
    // the prefix drop must be paid once at open, not replayed per action:
    // no zipWithIndex/ExistingRDD in the extraction plan, a parquet scan
    // (with its pushdown/pruning) in its place
    val plan = lf.df.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), plan)
    assert(plan.toLowerCase.contains("parquet"), plan)
    assert(lf.nrow == 2L)
  }

  test("csv skip cache: repeat opens share one content-addressed dir; purge removes it") {
    val cacheBase = Files.createTempDirectory("lfspec_skipcache")
    spark.conf.set("graft.csv.skipMaterializeDir", cacheBase.toString)
    try {
      val lines = Seq("# junk line", "x|y", "1|foo", "2|bar")
      val path = writeCsv(lines)
      def skipDirs: Seq[String] = {
        val ls = cacheBase.toFile.listFiles()
        if (ls == null) Nil
        else ls.map(_.getName).filter(_.startsWith("graft_skip_")).toSeq.sorted
      }
      val lf1 = LazyFrame.csv(spark, path, sep = "|", skip = 1)
      val after1 = skipDirs
      assert(after1.size == 1, s"one cache dir per (file, options): $after1")
      val lf2 = LazyFrame.csv(spark, path, sep = "|", skip = 1)
      assert(skipDirs == after1, "re-open of the same file+options reuses the copy")
      assert(lf1.nrow == 2L && lf2.nrow == 2L)
      // different parse options → distinct copy (content-addressed, not per-path)
      LazyFrame.csv(spark, path, sep = "|", skip = 1, naStrings = Seq("NA", "null"))
      assert(skipDirs.size == 2, s"distinct options get a distinct dir: $skipDirs")
      // an edited file (new mtime/length) must not serve the stale copy
      Files.write(java.nio.file.Paths.get(path),
        (lines :+ "3|baz").mkString("\n").getBytes("UTF-8"))
      val lf3 = LazyFrame.csv(spark, path, sep = "|", skip = 1)
      assert(lf3.nrow == 3L, "rewritten file gets a fresh copy, not the cache")
      // purge = the shutdown hook's body, invoked deterministically
      LazyFrame.purgeSkipCache(spark.sparkContext.hadoopConfiguration)
      assert(skipDirs.isEmpty, "purge deletes every session cache dir")
    } finally spark.conf.unset("graft.csv.skipMaterializeDir")
  }

  test("csv skip cache: concurrent opens of the same file publish ONE dir, no error") {
    val cacheBase = Files.createTempDirectory("lfspec_skipcache_conc")
    spark.conf.set("graft.csv.skipMaterializeDir", cacheBase.toString)
    try {
      val path = writeCsv(Seq("# junk", "x|y", "1|foo", "2|bar"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      // Two racing opens: the per-key lock serializes the write, the loser
      // reuses the published dir (atomic-rename publish, never a torn read).
      val frames = Await.result(Future.sequence(Seq.fill(2)(Future {
        LazyFrame.csv(spark, path, sep = "|", skip = 1)
      })), 120.seconds)
      frames.foreach(lf => assert(lf.nrow == 2L))
      val names = cacheBase.toFile.listFiles().map(_.getName).toSeq.sorted
      assert(names.size == 1 && names.head.startsWith("graft_skip_")
        && !names.head.contains(".tmp-"),
        s"exactly one published dir, no tmp leftovers: $names")
      LazyFrame.purgeSkipCache(spark.sparkContext.hadoopConfiguration)
      assert(cacheBase.toFile.listFiles().isEmpty, "purge covers the dir this JVM wrote")
    } finally spark.conf.unset("graft.csv.skipMaterializeDir")
  }

  test("csv open: gzip input read transparently (reference zlib vtable)") {
    val f = Files.createTempFile("lfspec", ".csv.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(f))
    out.write(irisish.mkString("\n").getBytes("UTF-8")); out.close()
    val lf = LazyFrame.csv(spark, f.toString)
    assert(lf.dim == (7L, 5))
  }

  test("filter semantics: the Rd example cardinalities") {
    val lf = LazyFrame.csv(spark, writeCsv(irisish), rowOrder = Seq("sl", "sw", "pl", "pw", "species"))
    assert(lf.filterFast(col("species") === "versicolor").count() == 2)
    assert(lf.filterFast(col("sl") < 4.5).count() == 2)
  }

  test("malformed numerics parse to null and never match (cheap_strtod NAN)") {
    val lines = Seq("a,b", "1,2.5", "oops,3.5", "3,bad")
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", DoubleType)))
    val lf = LazyFrame.csv(spark, writeCsv(lines), header = Some(true), schema = Some(schema))
    // 'oops' → null a; 'bad' → null b; comparisons never match nulls
    assert(lf.filterFast(col("a") > 0).count() == 2)
    assert(lf.filterFast(col("b") > 0.0).count() == 2)
    assert(lf.filterFast(col("b") <= 99.0).count() == 2)
  }

  test("row addressing: rowsRange, rowsAt, head/tail over pinned order") {
    val lf = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet", graft.operators.ParityQueries.rowOrderKey)
    assert(lf.rowsRange(1, 10).count() == 10)
    assert(lf.head(5).count() == 5)
    assert(lf.tail(5).count() == 5)
    // out-of-range ids silently dropped (R/lazy.frame.R:146-147)
    assert(lf.rowsAt(Seq(1L, 2L, 999999999L)).count() == 2)
    // non-positive ids rejected (R/lazy.frame.R:145)
    intercept[IllegalArgumentException](lf.rowsAt(Seq(0L)))
    // tail returns the LAST rows
    val lastId = lf.tail(1).select("row_id").collect().head.getLong(0)
    assert(lastId == lf.nrow)
  }

  test("row-addressed pushdown keeps NA-keyed rows (NULLs sort first)") {
    import spark.implicits._
    // NULLs sort first under the ascending order key, so head(n) on a
    // frame with NAs in the leading order column addresses a slice mixing
    // NULL and non-NULL keys — the leading-key scan pushdown must widen to
    // `k IS NULL OR k BETWEEN lo AND hi`, not silently drop the NA rows
    val df = Seq[(Option[Double], Int)](
      (None, 1), (None, 2), (Some(2.0), 3), (Some(3.0), 4), (Some(4.0), 5), (Some(5.0), 6)
    ).toDF("k", "v")
    val dir = Files.createTempDirectory("lfna").resolve("t.parquet").toString
    df.write.parquet(dir)
    val lf = LazyFrame.parquet(spark, dir, Seq("k", "v"))
    val h = lf.head(4).select("row_id", "v").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(h == Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
    // an all-NULL slice skips the pushdown entirely
    assert(lf.rowsRange(1, 2).select("v").collect().map(_.getInt(0)).toSet == Set(1, 2))
    // duplicate ids in a LINES request stay on the pruned path (gate is
    // on distinct count) and return membership semantics
    assert(lf.rowsAt(Seq(3L, 3L, 5L)).select("v").collect().map(_.getInt(0)).toSet == Set(3, 5))
  }

  test("which(pred) ids ∘ rowsAt ≡ filter(pred) — the reference two-pass identity") {
    val lf = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet", graft.operators.ParityQueries.rowOrderKey)
    val pred = col("l_quantity") >= 49.0
    val ids = lf.which(pred).collect().map(_.getLong(0)).toSeq
    val viaIds = lf.rowsAt(ids).select("l_orderkey", "l_linenumber").collect().toSet
    val direct = lf.filter(pred).select("l_orderkey", "l_linenumber").collect().toSet
    assert(ids.nonEmpty && viaIds == direct)
  }

  test("rowsAt(Dataset): distributed ids ≡ filter; no id literal in the plan; " +
      "session conf untouched") {
    import spark.implicits._
    val confKey = "spark.sql.requireAllClusterKeysForCoPartition"
    val before = spark.conf.get(confKey)
    val lf = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet",
      graft.operators.ParityQueries.rowOrderKey)
    val pred = col("l_quantity") >= 45.0
    val ids = lf.which(pred).select(col("row_id")).as[Long]
    val viaIds = lf.rowsAt(ids)
    val direct = lf.filter(pred).select("l_orderkey", "l_linenumber").collect().toSet
    assert(viaIds.select("l_orderkey", "l_linenumber").collect().toSet == direct)
    // the whole point of the overload: ids must not ride inside the plan
    val plan = viaIds.queryExecution.executedPlan.toString
    assert(!plan.contains("INSET") && !plan.contains(" IN ("),
      s"id list inlined into the plan:\n${plan.take(2000)}")
    assert(spark.conf.get(confKey) == before,
      "open+extract must not mutate the user's session conf (VERDICT r15 #4)")
    // empty id set → empty extraction; non-positive ids rejected like the Seq overload
    assert(lf.rowsAt(spark.emptyDataset[Long]).count() == 0)
    intercept[IllegalArgumentException](lf.rowsAt(Seq(-3L, 4L).toDS()).collect())
  }

  test("rowsAt big-list fallback: a Seq past rowAddressMax routes through the " +
      "distributed join — no InSet literal shipping in every task binary") {
    import spark.implicits._
    val key = "graft.extract.rowAddressMaxRows"
    spark.conf.set(key, "4")
    try {
      val lf = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet",
        graft.operators.ParityQueries.rowOrderKey)
      val ids = Seq(5L, 15L, 25L, 999L, 1000L, 4999L, 6000L, 999999999L)
      val out = lf.rowsAt(ids) // 8 distinct > max 4 → distributed path
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("INSET") && !plan.contains(" IN ("),
        s"big-list fallback still inlines ids:\n${plan.take(2000)}")
      val expect = ids.filter(_ <= lf.nrow).toSet
      assert(out.select("row_id").collect().map(_.getLong(0)).toSet == expect)
      // the Dataset overload above the threshold returns the same rows
      assert(lf.rowsAt(ids.toDS()).select("row_id").collect()
        .map(_.getLong(0)).toSet == expect)
    } finally spark.conf.unset(key)
  }

  test("column projection: unknown names silently dropped; pushdown-safe") {
    val lf = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet", graft.operators.ParityQueries.rowOrderKey)
    val sel = lf.select(Seq("l_orderkey", "l_linenumber", "not_a_column"))
    assert(sel.columns == Seq("l_orderkey", "l_linenumber"))
  }

  test("projection preserves parent row numbering even when order-key cols are dropped") {
    val lf = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet", graft.operators.ParityQueries.rowOrderKey)
    // l_quantity is NOT part of the order key: projecting to it alone must
    // keep the parent's ids (the reference numbers physical lines, which
    // projection never changes)
    val sel = lf.select(Seq("l_quantity"))
    assert(sel.columns == Seq("l_quantity"))
    val parent = lf.rowsRange(11, 20).select("row_id", "l_quantity").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val child = sel.rowsRange(11, 20).select("row_id", "l_quantity").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(child == parent && child.size == 10)
  }

  test("columnAttr metadata persists through extraction (column_attr<-)") {
    val meta = new MetadataBuilder().putStringArray("levels", Array("A", "N", "R")).build()
    val lf = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet", graft.operators.ParityQueries.rowOrderKey)
      .withColumnAttr("l_returnflag", meta)
    val out = lf.filter(col("l_quantity") > 45)
    assert(out.schema("l_returnflag").metadata.getStringArray("levels").toSeq == Seq("A", "N", "R"))
    assert(lf.columnAttr("l_returnflag").contains(meta))
  }

  test("renameColumns applies make.names sanitization") {
    assert(LazyFrame.makeNames(Seq("a b", "1x", "ok", "ok")) == Seq("a.b", "X1x", "ok", "ok.1"))
    val lf = LazyFrame.csv(spark, writeCsv(Seq("a,b", "1,2")))
    val renamed = lf.renameColumns(Seq("col 1", "2nd"))
    assert(renamed.columns == Seq("col.1", "X2nd"))
  }

  // iris-shaped 150-row fixture with the Rd example's invariants
  // (man/lazy.frame.Rd:82-100): exactly rows {9,14,39,43} have col1 < 4.5,
  // exactly 50 rows are 'versicolor'. `id` mirrors physical line order (the
  // LazyFrame analogue of the reference's newline index).
  private val irisLow = Map(9 -> 4.4, 14 -> 4.3, 39 -> 4.4, 43 -> 4.4)
  private def iris150: Seq[String] =
    "sl,sw,pl,pw,species,id" +: (1 to 150).map { i =>
      val sl = irisLow.getOrElse(i, 4.5 + (i * 7 % 30) / 10.0)
      val sp = if (i <= 50) "setosa" else if (i <= 100) "versicolor" else "virginica"
      f"$sl%.1f,${2.0 + (i * 3 % 25) / 10.0}%.1f,${1.0 + (i * 11 % 60) / 10.0}%.1f,${i / 1000.0}%.3f,$sp,$i"
    }

  test("Rd example semantics: x[x[,1]<4.5,] rows and versicolor cardinality") {
    val lf = LazyFrame.csv(spark, writeCsv(iris150), rowOrder = Seq("id"))
    val ids = lf.which(col("sl") < 4.5).collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(9L, 14L, 39L, 43L))
    val v = lf.filter(col("species") === "versicolor")
    assert(v.count() == 50)
    // filter+extract returns the full rows with their pinned ids
    val low = lf.filter(col("sl") < 4.5).select("row_id", "sl").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(low == Map(9L -> 4.4, 14L -> 4.3, 39L -> 4.4, 43L -> 4.4))
  }

  test("na.strings: every marker parses to NA in every column (read.table passthrough)") {
    val lines = Seq("a,b,s", "1,2.5,x", "NULL,3.5,y", "3,?,NULL", "4,4.5,z")
    val lf = LazyFrame.csv(spark, writeCsv(lines), naStrings = Seq("NULL", "?"))
    assert(lf.df.schema("a").dataType == LongType) // NA markers don't break inference... via cast
    assert(lf.filterFast(col("a").isNull).count() == 1)
    assert(lf.filterFast(col("b").isNull).count() == 1)
    assert(lf.filterFast(col("s").isNull).count() == 1)
    // malformed-NA semantics: null never matches a comparison
    assert(lf.filterFast(col("b") > 0.0).count() == 3)
  }

  test("quote: quoted separators stay one field; quote='' disables") {
    val lines = Seq("a;s", "1;'x;y'", "2;plain")
    val lf = LazyFrame.csv(spark, writeCsv(lines), sep = ";", quote = "'")
    assert(lf.filterFast(col("s") === "x;y").count() == 1)
  }

  test("dec=',': European decimal separator parses doubles") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("x", DoubleType), StructField("s", StringType)))
    val lines = Seq("x;s", "1,5;a", "2,25;b", "bad;c")
    val lf = LazyFrame.csv(spark, writeCsv(lines), sep = ";", header = Some(true),
      schema = Some(schema), dec = ',')
    val got = lf.df.collect().map(r => Option(r.get(0))).toSeq
    assert(got == Seq(Some(1.5), Some(2.25), None))
  }

  test("row.names from a file column: excluded from data cols, surfaced on extraction") {
    val lines = Seq("name,x,y", "alpha,1,10.5", "beta,2,20.5", "gamma,3,30.5")
    val lf = LazyFrame.csv(spark, writeCsv(lines), rowNames = Some(1), rowOrder = Seq("x"))
    assert(lf.columns == Seq("x", "y") && lf.ncol == 2)
    // positional addressing shifts past the row-names column (C WHICH adj)
    assert(lf.selectAt(Seq(2)).columns == Seq("y"))
    val out = lf.rowsRange(2, 3).select("row_names", "x").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._2)
    assert(out == Seq(("beta", 2L), ("gamma", 3L)))
  }

  test("factor levels are APPLIED to extractions: out-of-level values become NA") {
    // column_attr.Rd:43-64 — pin levels; extracted subsets recode against them
    val lf = LazyFrame.csv(spark, writeCsv(iris150), rowOrder = Seq("id"))
    val full = new MetadataBuilder()
      .putStringArray("levels", Array("setosa", "versicolor", "virginica")).build()
    val known = lf.withColumnAttr("species", full)
    assert(known.filter(col("id") <= 150).where(col("species").isNull).count() == 0)
    // restricting the levels recodes everything else to NA
    val restricted = lf.withColumnAttr("species",
      new MetadataBuilder().putStringArray("levels", Array("setosa")).build())
    val out = restricted.filter(col("id") <= 150)
    assert(out.where(col("species").isNull).count() == 100)
    assert(out.schema("species").metadata.getStringArray("levels").toSeq == Seq("setosa"))
  }

  test("reopen re-binds to the source: same dims, same row ids (REOPEN)") {
    val lf = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet",
      graft.operators.ParityQueries.rowOrderKey).cached()
    val before = lf.rowsRange(5, 8).select("row_id", "l_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val re = lf.reopen()
    assert(re.dim == lf.dim)
    val after = re.rowsRange(5, 8).select("row_id", "l_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(after == before)
  }

  test("printFrame and str render header, shape and column info (print/str)") {
    val lf = LazyFrame.csv(spark, writeCsv(irisish))
    val p = lf.printFrame(3)
    assert(p.startsWith("A lazy frame with 7 rows and 5 columns"))
    assert(p.contains("species") && p.contains("more rows not displayed"))
    assert(p.linesIterator.size == 3 + 3) // header + colnames + 3 rows + footer
    val s = lf.str()
    assert(s.contains("7 obs. of 5 variables"))
    assert(s.contains("$ sl: double") && s.contains("$ species: string"))
  }

  test("summary is a real distributed describe (reference stubs it)") {
    val lf = LazyFrame.csv(spark, writeCsv(irisish))
    val stats = lf.summary().collect().map(r => r.getString(0))
    assert(stats.contains("mean") && stats.contains("max"))
  }

  test("index persist guard: tiny storage fraction downgrades to DISK_ONLY; NONE skips; results unchanged") {
    import scala.jdk.CollectionConverters._
    def persistedLevels(before: Set[Int]) =
      spark.sparkContext.getPersistentRDDs.filterNot(kv => before(kv._1))
        .values.map(_.getStorageLevel).toSeq
    def snapshot() = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val key = graft.operators.ParityQueries.rowOrderKey
    val expect = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet", key)
      .head(5).collect().map(_.toSeq).toSeq
    try {
      // force the heap-proportional branch below any real estimate
      spark.conf.set("graft.index.maxStorageFraction", "1e-12")
      val before = snapshot()
      val lf = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet", key).cached()
      val levels = persistedLevels(before)
      assert(levels.nonEmpty && levels.forall(l => l.useDisk && !l.useMemory),
        s"expected DISK_ONLY persists, got $levels")
      assert(lf.head(5).collect().map(_.toSeq).toSeq == expect)
      lf.reopen() // drop the persists again
      // explicit override beats the estimate
      spark.conf.set("graft.index.storageLevel", "NONE")
      val before2 = snapshot()
      val lf2 = LazyFrame.parquet(spark, s"$sf0/lineitem.parquet", key).cached()
      assert(persistedLevels(before2).isEmpty, "NONE must not persist")
      assert(lf2.head(5).collect().map(_.toSeq).toSeq == expect)
    } finally {
      spark.conf.unset("graft.index.maxStorageFraction")
      spark.conf.unset("graft.index.storageLevel")
    }
  }

  test("CsvProbe type inference and merging") {
    assert(CsvProbe.inferType("42") == LongType)
    assert(CsvProbe.inferType("4.5") == DoubleType)
    assert(CsvProbe.inferType("4.5e3") == DoubleType)
    assert(CsvProbe.inferType("abc") == StringType)
    assert(CsvProbe.inferType("NA") == NullType)
    assert(CsvProbe.mergeTypes(Seq(LongType, DoubleType)) == DoubleType)
    assert(CsvProbe.mergeTypes(Seq(LongType, StringType)) == StringType)
    assert(CsvProbe.mergeTypes(Seq(NullType, LongType)) == LongType)
    assert(CsvProbe.splitLine("a,\"b,c\",d", ",") == Seq("a", "\"b,c\"", "d"))
  }
}
