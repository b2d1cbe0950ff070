package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A lazy, read-only, row-addressable frame over a file — the Spark-native
  * re-expression of the reference's "data frame promise"
  * (`/root/reference/R/lazy.frame.R:37-87`, `man/lazy.frame.Rd:4-10`).
  *
  * Semantic contract carried over from the reference:
  *
  *   - '''Metadata-only open''': construction touches at most a few sample
  *     rows (schema probe, `R/lazy.frame.R:67-84`); no data moves until an
  *     action — which is exactly Spark's lazy `LogicalPlan` model.
  *   - '''Stable row numbering''': the reference addresses "the N-th physical
  *     line" via its newline index (`src/lazy.frame.c:252-298`). Distributed
  *     files have no innate total order, so a LazyFrame pins an explicit
  *     `rowOrder` (a total ordering key) at open time; `row_id` is assigned
  *     1..N under that order.
  *   - '''which()-style filters''': `which(pred)` returns matching 1-based
  *     row ids, like `Ops.lazy.frame` (`R/lazy.frame.R:182-204`); the fused
  *     `filter(pred)` is the one-pass version Catalyst gives us for free.
  *   - '''Persistent column attributes''': `columnAttr` mirrors
  *     `column_attr<-` (`R/lazy.frame.R:17-35`) via Catalyst column
  *     `Metadata`, which survives projections.
  *   - '''Read-only''': there is no write surface, matching
  *     `R/lazy.frame.R:121-124` ("File frames are read-only.").
  *
  * Scale notes (100 TB design):
  *   - `row_id` assignment uses range-repartition + per-partition sort +
  *     `zipWithIndex` — no single-task global window. Cost is one extra pass
  *     to count partition sizes; ids are deterministic because `rowOrder`
  *     must be a total order (callers append a unique tiebreak).
  *   - Everything else is stock Catalyst: filters/projections push down to
  *     the scan, comparisons stay inside whole-stage codegen.
  */
final class LazyFrame private (
    val df: DataFrame,
    val rowOrder: Seq[String],
    private val attrs: Map[String, Metadata]) {

  import LazyFrame.ROW_ID

  /** Cached row count: O(1) `nrow` after first use, like the reference's
    * construction-time `dim` capture (`R/lazy.frame.R:80-81`). */
  lazy val nrow: Long = df.count()
  def ncol: Int = df.schema.length
  def dim: (Long, Int) = (nrow, ncol)
  def columns: Seq[String] = df.columns.toSeq

  private def spark: SparkSession = df.sparkSession

  /** The frame with its pinned 1-based `row_id`. Distributed id assignment:
    * range-partition on the row order, sort within partitions, then offset
    * each partition by the cumulative count of its predecessors
    * (`zipWithIndex`) — the scalable equivalent of the reference's newline
    * index. Memoized (and persisted by `cached()`): the reference builds
    * its newline index once at open and reuses it for every extraction
    * (`R/lazy.frame.R:47-50`); re-deriving it per query would repeat the
    * indexing scan. */
  lazy val withRowId: DataFrame = {
    val ordered = df
      .repartitionByRange(df.sparkSession.sessionState.conf.numShufflePartitions,
        rowOrder.map(col): _*)
      .sortWithinPartitions(rowOrder.map(col): _*)
    val schema = ordered.schema.add(ROW_ID, LongType, nullable = false)
    val rdd = ordered.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Persist the row-id index (MEMORY_AND_DISK) — the analogue of the
    * reference keeping its newline index resident for the frame's
    * lifetime. Returns this frame for chaining. */
  def cached(): LazyFrame = {
    withRowId.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    this
  }

  // ---- extraction (the reference's `[` — R/lazy.frame.R:126-180) ----

  /** Contiguous rows lo..hi (1-based, inclusive) — the RANGE path
    * (`src/lazy.frame.c:189-216`). */
  def rowsRange(lo: Long, hi: Long): DataFrame =
    applyAttrs(withRowId.where(col(ROW_ID).between(lo, hi)))

  /** Arbitrary row ids — the LINES path (`src/lazy.frame.c:219-245`).
    * Out-of-range ids are silently dropped (`R/lazy.frame.R:146-147`);
    * non-positive ids are rejected (`R/lazy.frame.R:145`). */
  def rowsAt(ids: Seq[Long]): DataFrame = {
    require(ids.forall(_ > 0), "only positive row indices are supported")
    applyAttrs(withRowId.where(col(ROW_ID).isin(ids: _*)))
  }

  /** Column projection by name; unknown names silently dropped
    * (`R/lazy.frame.R:146-147`). Unlike the reference (which parses full
    * rows then projects in R, `R/lazy.frame.R:179`), this is true pushdown:
    * the parquet/CSV scan reads only the requested columns. */
  def select(names: Seq[String]): LazyFrame = {
    val keep = names.filter(df.columns.contains)
    new LazyFrame(df.select(keep.map(col): _*), rowOrder.filter(keep.contains), attrs)
  }

  /** Column projection by 1-based position (reference columns are 1-based). */
  def selectAt(positions: Seq[Int]): LazyFrame =
    select(positions.filter(p => p >= 1 && p <= ncol).map(p => df.columns(p - 1)))

  // ---- predicate surface (Ops.lazy.frame — R/lazy.frame.R:182-204) ----

  /** Matching 1-based row ids for a predicate — `x[, col] OP value` returns
    * indices like `which()` (`man/lazy.frame.Rd:43-47`). One distributed
    * scan; only ids surface, mirroring the C `WHICH` kernel returning hit
    * arrays, not rows (`src/lazy.frame.c:617-698`). */
  def which(pred: Column): DataFrame =
    withRowId.where(pred).select(col(ROW_ID)).orderBy(col(ROW_ID))

  /** Fused filter+extract — the reference idiom `x[x[,c] OP v, ]`
    * (vignette `inst/doc/lazy.frame.Rnw:272-281`) collapsed to the single
    * pass Catalyst plans anyway. */
  def filter(pred: Column): DataFrame = applyAttrs(withRowId.where(pred))

  /** Filter without row ids — pure pushdown path (no id assignment pass);
    * use when row addressing isn't needed. */
  def filterFast(pred: Column): DataFrame = applyAttrs(df.where(pred))

  // ---- head / tail / print (R/lazy.frame.R:234-261) ----

  def head(n: Int = 6): DataFrame = rowsRange(1L, n.toLong)
  def tail(n: Int = 6): DataFrame = rowsRange(math.max(1L, nrow - n + 1), nrow)

  /** `print.lazy.frame`: header + head + "(N more rows)" (`R/lazy.frame.R:255-261`). */
  def printFrame(n: Int = 6): String = {
    val rows = head(n).collect()
    val cols = df.columns :+ ROW_ID
    val more = math.max(0L, nrow - n)
    val body = rows.map(_.toSeq.map(v => if (v == null) "NA" else v.toString).mkString("\t"))
    (s"A lazy frame with $nrow rows and $ncol columns" +:
      cols.mkString("\t") +: body :+ s"($more more rows not displayed)").mkString("\n")
  }

  // ---- metadata ops (R/lazy.frame.R:17-35,110-113,217-232) ----

  /** Get a persistent column attribute (reference `column_attr`). */
  def columnAttr(column: String): Option[Metadata] = attrs.get(column)

  /** Set a persistent column attribute; returns a new frame (immutably —
    * the reference mutates its environment, we don't). Attributes are
    * re-applied to every extraction, like `R/lazy.frame.R:167-178`. */
  def withColumnAttr(column: String, meta: Metadata): LazyFrame = {
    require(df.columns.contains(column), s"no such column: $column")
    new LazyFrame(df, rowOrder, attrs + (column -> meta))
  }

  /** Rename columns with `make.names`-style sanitization
    * (`R/lazy.frame.R:110-113`): invalid chars → '.', prefix 'X' if the
    * name doesn't start with a letter or '.'. */
  def renameColumns(newNames: Seq[String]): LazyFrame = {
    require(newNames.length == ncol, "names length must match ncol")
    val clean = LazyFrame.makeNames(newNames)
    val renamed = df.toDF(clean: _*)
    val order = rowOrder.map(o => clean(df.columns.indexOf(o)))
    new LazyFrame(renamed, order, attrs.map { case (k, v) =>
      clean(df.columns.indexOf(k)) -> v
    })
  }

  /** `summary` is a stub in the reference (`R/lazy.frame.R:115-119`);
    * here it's a real distributed describe. */
  def summary(): DataFrame = df.summary()

  /** `str.lazy.frame` (`R/lazy.frame.R:246-253`): internals + head shape. */
  def str(): String =
    s"lazy frame: $nrow obs. of $ncol variables (rowOrder=${rowOrder.mkString(",")})\n" +
      df.schema.fields.map(f => s" $$ ${f.name}: ${f.dataType.simpleString}").mkString("\n")

  /** REOPEN (`src/lazy.frame.c:94-130`): re-bind to the source — plans are
    * re-executable by construction, so this just drops cached state (the
    * reference re-opens its file handle after deserialization). */
  def reopen(): LazyFrame = {
    withRowId.unpersist()
    new LazyFrame(df, rowOrder, attrs)
  }

  private def applyAttrs(d: DataFrame): DataFrame =
    if (attrs.isEmpty) d
    else attrs.foldLeft(d) { case (acc, (name, meta)) =>
      if (acc.columns.contains(name)) acc.withColumn(name, col(name).as(name, meta))
      else acc
    }
}

object LazyFrame {
  val ROW_ID = "row_id"

  /** Open a parquet table with a pinned row order (schema comes free from
    * the footer — the moral equivalent of the reference's sampled probe). */
  def parquet(spark: SparkSession, path: String, rowOrder: Seq[String]): LazyFrame =
    fromDataFrame(spark.read.parquet(path), rowOrder)

  /** Open a delimited text file, plain or .gz (Spark decodes gz
    * transparently, like the reference's zlib vtable,
    * `src/lazy.frame.c:43-74`). Schema and header are probed from a ≤5-row
    * sample read on the driver — metadata-only open, no full-file job
    * (`R/lazy.frame.R:67-84`).
    *
    * @param header Some(true/false) to force; None = auto-detect like the
    *               reference (`R/lazy.frame.R:76-79`)
    * @param rowOrder total-order key for row addressing; Nil = use all
    *                 columns in sequence (adequate for files whose rows are
    *                 unique; callers with duplicate rows should supply a key)
    */
  def csv(
      spark: SparkSession,
      path: String,
      sep: String = ",",
      header: Option[Boolean] = None,
      skip: Int = 0,
      schema: Option[StructType] = None,
      rowOrder: Seq[String] = Nil): LazyFrame = {

    val probe = CsvProbe.probe(spark, path, sep, skip)
    val hasHeader = header.getOrElse(probe.headerDetected)
    val finalSchema = schema.getOrElse(
      if (hasHeader) probe.schemaWithHeaderNames else probe.schemaGenericNames)

    // malformed fields → null → never match filters, like cheap_strtod →
    // NAN (src/lazy.frame.c:413-462): PERMISSIVE mode (the default)
    val df =
      if (skip == 0) {
        spark.read
          .option("sep", sep)
          .option("header", hasHeader.toString)
          .option("mode", "PERMISSIVE")
          .schema(finalSchema)
          .csv(path)
      } else {
        // Spark CSV has no skip-N-lines option: emulate the reference's
        // `internalskip` (R/lazy.frame.R:62-65) by dropping the first
        // skip(+header) physical lines of the text, then parsing.
        val raw = spark.read.text(path)
        val dropN = skip + (if (hasHeader) 1 else 0)
        val rdd = raw.rdd.zipWithIndex()
          .filter(_._2 >= dropN).map(_._1)
        spark.createDataFrame(rdd, raw.schema)
          .select(from_csv(col("value"), finalSchema, Map("sep" -> sep)).as("r"))
          .select("r.*")
      }
    val order = if (rowOrder.nonEmpty) rowOrder else finalSchema.fieldNames.toSeq
    new LazyFrame(df, order, Map.empty)
  }

  def fromDataFrame(df: DataFrame, rowOrder: Seq[String]): LazyFrame = {
    require(rowOrder.nonEmpty, "a LazyFrame needs a pinned total row order")
    require(rowOrder.forall(df.columns.contains), "rowOrder must name existing columns")
    new LazyFrame(df, rowOrder, Map.empty)
  }

  /** R `make.names` semantics (subset used by the reference's dimnames
    * setter, `R/lazy.frame.R:110-113`). */
  def makeNames(names: Seq[String]): Seq[String] = {
    val base = names.map { n =>
      val cleaned = n.map(c => if (c.isLetterOrDigit || c == '.' || c == '_') c else '.')
      if (cleaned.isEmpty || !(cleaned.head.isLetter || cleaned.head == '.')) "X" + cleaned
      else cleaned
    }
    // de-duplicate like make.names(unique=TRUE)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    base.map { n =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      if (k == 0) n else s"$n.$k"
    }
  }
}
