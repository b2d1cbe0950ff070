package graft.operators

import graft.core.{LazyFrame, Norm, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity operators (SURVEY.md §2): row-range / scattered-row
  * extraction, which()-style index filters, the six comparison ops over
  * int / double / string, projection, head/tail, and summary stats.
  *
  * Every query pins the same row order as its oracle:
  * `row_number() OVER (ORDER BY l_orderkey, l_linenumber)` — the Spark side
  * assigns ids scalably (narrow key→row_id index joined to a pushdown
  * FileScan, LazyFrame.withRowId) but under the identical total order.
  */
object ParityQueries {

  /** lineitem as a LazyFrame with its pinned row order. One frame per
    * (session, dir), like one open per file in the reference — the row-id
    * index is built once and shared by every parity query.
    *
    * The order key must be a TOTAL order (LazyFrame contract): in the
    * harness data `(l_orderkey, l_linenumber)` alone is not unique, so the
    * key extends with partkey/suppkey/extendedprice, which together are —
    * and the oracle's `row_number() OVER (ORDER BY ...)` pins the identical
    * order, making ids deterministic on both engines (rather than relying
    * on coincidental tie-breaking). */
  private[graft] val rowOrderKey: Seq[String] =
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
  private val frames = new graft.core.SessionCache[LazyFrame]
  private def li(s: SparkSession, d: String): LazyFrame =
    frames.getOrElseUpdate(s, d)(
      LazyFrame.parquet(s, s"$d/lineitem.parquet", rowOrderKey).cached())

  /** The REOPEN fixture: open orders → build the cached index → `reopen()`
    * drops the persisted index and re-binds to the source
    * (`src/lazy.frame.c:94-130`); later extractions rebuild from the
    * re-opened binding. Projected to 3 columns so the extraction scan stays
    * narrow, and memoized per (session, dir) like [[li]] — repeated bench
    * legs must not accumulate persisted index copies (the r15 `gc_ms`
    * regression pattern). */
  private val reopenedFrames = new graft.core.SessionCache[LazyFrame]
  private def ordersReopened(s: SparkSession, d: String): LazyFrame =
    reopenedFrames.getOrElseUpdate(s, d)(
      LazyFrame.parquet(s, s"$d/orders.parquet", Seq("o_orderkey"))
        .select(Seq("o_orderkey", "o_custkey", "o_totalprice"))
        .cached()
        .reopen())

  /** The ORC-source fixture (`lf_orc_open`): documents materialized as an
    * ORC table once per (session, dir) under the gitignored target/, then
    * opened through the full LazyFrame contract (footer schema, row-id
    * index on doc_id). Memoized like [[li]] so bench legs rebuild
    * nothing. */
  private val orcFrames = new graft.core.SessionCache[LazyFrame]
  private def docsOrc(s: SparkSession, d: String): LazyFrame =
    orcFrames.getOrElseUpdate(s, d) {
      val dir = new java.io.File(
        s"target/orc_docs/${math.abs(d.hashCode)}").getAbsolutePath
      Tables.documents(s, d).write.mode("overwrite").orc(dir)
      LazyFrame.orc(s, dir, rowOrder = Seq("doc_id")).cached()
    }

  /** Shared projection: all lineitem columns, timestamp stringified. */
  private def proj(df: DataFrame, withRowId: Boolean = true): DataFrame = {
    val base = Seq(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"),
      Norm.dateStr(col("l_shipdate")).as("ship_date"))
    val cols = if (withRowId) base :+ col("row_id") else base
    df.select(cols: _*)
  }

  private val lfCte =
    """WITH lf AS (
      |  SELECT *, row_number() OVER (ORDER BY l_orderkey, l_linenumber,
      |                               l_partkey, l_suppkey, l_extendedprice) AS row_id
      |  FROM lineitem
      |)""".stripMargin

  private val projSql =
    """l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      | l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      | strftime(l_shipdate, '%Y-%m-%d') AS ship_date, row_id""".stripMargin

  /** One comparison-filter query (Ops.lazy.frame: the six ops over the
    * literal's type — `R/lazy.frame.R:182-204`, `src/lazy.frame.c:315-406`). */
  private def cmp(pred: Column, sqlPred: String): Q = Q(
    (s, d) => proj(li(s, d).filter(pred)).orderBy("row_id"),
    s"$lfCte SELECT $projSql FROM lf WHERE $sqlPred ORDER BY row_id")

  /** Deterministic CSV fixture for the end-to-end csv-open oracle row
    * (`lf_csv_open`): the harness tables are parquet, so the CSV surface —
    * probe, header autodetect, skip, na.strings, quoting, the
    * skip-materialize cache — had unit tests but no DuckDB twin until now
    * (VERDICT r6 #6). Both engines read the same file at a FIXED path:
    * Spark through `LazyFrame.csv`, DuckDB through `read_csv` with the
    * equivalent options. Content is pure formula (no RNG), written
    * atomically and only when absent/different so the file's mtime — part
    * of the skip-cache key — stays stable across a Bench run. */
  /** Fixture paths are user-scoped under java.io.tmpdir (ADVICE r7: a fixed
    * world-visible /tmp name can be squatted by another user on a multi-user
    * host, failing the sticky-bit ATOMIC_MOVE). */
  private def fixturePath(name: String): String = {
    val user = sys.props.getOrElse("user.name", "user")
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp").stripSuffix("/")
    s"$tmp/graft_${user}_$name"
  }
  private[graft] val csvFixturePath = fixturePath("lf_fixture.csv")
  private[graft] val csvGzFixturePath = fixturePath("lf_fixture.csv.gz")
  private[graft] val csvLocaleFixturePath = fixturePath("lf_fixture_locale.csv")
  private[graft] val csvRowNamesFixturePath = fixturePath("lf_fixture_rownames.csv")

  /** Write `bytes` at `path` atomically, only when absent/different, so the
    * file's mtime — part of the skip-cache key — stays stable across a run. */
  private def ensureFixtureBytes(path: String, bytes: Array[Byte]): String = {
    val p = java.nio.file.Paths.get(path)
    val same = java.nio.file.Files.exists(p) &&
      java.util.Arrays.equals(java.nio.file.Files.readAllBytes(p), bytes)
    if (!same) {
      val tmp = java.nio.file.Files.createTempFile(
        p.getParent, p.getFileName.toString, ".tmp")
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    path
  }

  private def csvFixtureContent: String = {
    val sb = new StringBuilder
    sb ++= "# graft csv fixture — skipped line 1\n"
    sb ++= "# skipped line 2\n"
    sb ++= "id,val,name\n"
    (1 to 60).foreach { i =>
      val name =
        if (i % 7 == 0) "NA"                    // na.strings → null
        else if (i % 5 == 0) s""""x, y$i""""    // quoted field with sep inside
        else s"n$i"
      sb ++= s"$i,${i / 4.0},$name\n"           // i/4.0: exact binary doubles
    }
    sb.toString
  }
  private def ensureCsvFixture(): String =
    ensureFixtureBytes(csvFixturePath, csvFixtureContent.getBytes("UTF-8"))

  /** Same content gzipped (Java's GZIPOutputStream writes MTIME=0, so the
    * bytes are deterministic and the absent/different check holds). */
  private def ensureCsvGzFixture(): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(csvFixtureContent.getBytes("UTF-8")); gz.close()
    ensureFixtureBytes(csvGzFixturePath, bos.toByteArray)
  }

  /** European-locale variant: sep=';', dec=',' (read.table's `dec`) — takes
    * the string-parse-and-cast path in LazyFrame.csv (dec != '.'). */
  private def ensureCsvLocaleFixture(): String = {
    val sb = new StringBuilder
    sb ++= "id;val;name\n"
    (1 to 60).foreach { i =>
      val name = if (i % 7 == 0) "NA" else s"n$i"
      sb ++= s"$i;${(i / 4.0).toString.replace('.', ',')};$name\n"
    }
    ensureFixtureBytes(csvLocaleFixturePath, sb.toString.getBytes("UTF-8"))
  }

  /** row.names fixture: first column holds row names (`row.names=1`,
    * `R/lazy.frame.R:53-58`) — excluded from data columns, surfaced as a
    * trailing `row_names` on extractions (`src/lazy.frame.c:632-636`). */
  private def ensureCsvRowNamesFixture(): String = {
    val sb = new StringBuilder
    sb ++= "rn,id,val\n"
    (1 to 60).foreach { i => sb ++= s"r$i,$i,${i / 4.0}\n" }
    ensureFixtureBytes(csvRowNamesFixturePath, sb.toString.getBytes("UTF-8"))
  }

  /** JSONL fixture for the end-to-end `sources.Jsonl` oracle row: every 7th
    * object omits `score` (absent key → null on both engines). Malformed
    * lines are deliberately NOT here — Spark PERMISSIVE yields a null row
    * while DuckDB `ignore_errors` SKIPS the object, an engine-semantics
    * divergence that stays unit-tested (JsonlSpec), not oracled. */
  private[graft] val jsonlFixturePath = fixturePath("lf_fixture.jsonl")
  private def ensureJsonlFixture(): String = {
    val sb = new StringBuilder
    (1 to 50).foreach { i =>
      val score = if (i % 7 == 0) "" else s""", "score": ${i / 4.0}"""
      sb ++= s"""{"id": $i$score, "tag": "t$i"}\n"""
    }
    ensureFixtureBytes(jsonlFixturePath, sb.toString.getBytes("UTF-8"))
  }

  val scatteredIds: Seq[Long] = Seq(5L, 15L, 25L, 999L, 1000L, 4999L, 6000L, 999999999L)

  val all: Map[String, Q] = Map(
    // -- head / tail (R/lazy.frame.R:234-244) --
    "lf_head" -> Q(
      (s, d) => proj(li(s, d).head(10)).orderBy("row_id"),
      s"$lfCte SELECT $projSql FROM lf WHERE row_id <= 10 ORDER BY row_id"),
    "lf_tail" -> Q(
      (s, d) => proj(li(s, d).tail(10)).orderBy("row_id"),
      s"""$lfCte SELECT $projSql FROM lf
         | WHERE row_id > (SELECT count(*) FROM lineitem) - 10 ORDER BY row_id""".stripMargin),

    // -- contiguous range extraction (RANGE, src/lazy.frame.c:189-216) --
    "lf_rows_range" -> Q(
      (s, d) => proj(li(s, d).rowsRange(101, 200)).orderBy("row_id"),
      s"$lfCte SELECT $projSql FROM lf WHERE row_id BETWEEN 101 AND 200 ORDER BY row_id"),

    // -- scattered extraction (LINES, src/lazy.frame.c:219-245); the huge id
    //    is silently dropped like out-of-range j (R/lazy.frame.R:146-147) --
    "lf_rows_at" -> Q(
      (s, d) => proj(li(s, d).rowsAt(scatteredIds)).orderBy("row_id"),
      s"""$lfCte SELECT $projSql FROM lf
         | WHERE row_id IN (${scatteredIds.mkString(",")}) ORDER BY row_id""".stripMargin),

    // -- LINES at which()-scale (VERDICT r15 #1): the reference's flagship
    //    composition x[which(x[,k] OP v), ] (vignette :272-281) with a
    //    DISTRIBUTED id set — the ids never materialize on the driver and
    //    never ride inside the plan; they join the row index instead --
    "lf_rows_at_big" -> Q(
      (s, d) => {
        import s.implicits._
        val f = li(s, d)
        val ids = f.which(col("l_quantity") > 45.0).select(col("row_id")).as[Long]
        proj(f.rowsAt(ids)).orderBy("row_id")
      },
      s"$lfCte SELECT $projSql FROM lf WHERE l_quantity > 45.0 ORDER BY row_id"),

    // -- REOPEN (src/lazy.frame.c:94-130, R/lazy.frame.R:41-45): open →
    //    cached index → reopen() drops it and re-binds to the source; the
    //    extraction below rebuilds from the re-opened binding and must
    //    match the plain-SQL answer (the pre-reopen extraction is the same
    //    deterministic query, so one oracle pins both) --
    "lf_reopen" -> Q(
      (s, d) => ordersReopened(s, d)
        .filter(col("o_totalprice") > 400000.0)
        .orderBy("row_id"),
      """WITH lf AS (
        |  SELECT *, row_number() OVER (ORDER BY o_orderkey) AS row_id FROM orders
        |)
        |SELECT o_orderkey, o_custkey, o_totalprice, row_id FROM lf
        | WHERE o_totalprice > 400000.0 ORDER BY row_id""".stripMargin),

    // -- which(): indices only (Ops.lazy.frame → WHICH kernel) --
    "lf_which_gt" -> Q(
      (s, d) => li(s, d).which(col("l_quantity") > 30.0),
      s"$lfCte SELECT row_id FROM lf WHERE l_quantity > 30.0 ORDER BY row_id"),

    // -- the six comparison ops, typed literals (man/lazy.frame.Rd:55-59) --
    "lf_filter_eq_str" -> cmp(col("l_returnflag") === "R", "l_returnflag = 'R'"),
    "lf_filter_ne_str" -> cmp(col("l_linestatus") =!= "F", "l_linestatus <> 'F'"),
    "lf_filter_gt_dbl" -> cmp(col("l_extendedprice") > 90000.0, "l_extendedprice > 90000.0"),
    "lf_filter_ge_dbl" -> cmp(col("l_quantity") >= 49.0, "l_quantity >= 49.0"),
    "lf_filter_lt_int" -> cmp(col("l_linenumber") < 2, "l_linenumber < 2"),
    "lf_filter_le_int" -> cmp(col("l_suppkey") <= 3L, "l_suppkey <= 3"),

    // -- flagship: filter + extract fused (vignette :272-281) --
    "lf_filter_extract" -> Q(
      (s, d) => proj(li(s, d).filter(col("l_quantity") >= 49.0 && col("l_returnflag") === "A"))
        .orderBy("row_id"),
      s"""$lfCte SELECT $projSql FROM lf
         | WHERE l_quantity >= 49.0 AND l_returnflag = 'A' ORDER BY row_id""".stripMargin),

    // -- projection pushdown (reference projects post-parse; we prune at scan) --
    "lf_select" -> Q(
      (s, d) => li(s, d).select(Seq("l_orderkey", "l_linenumber", "l_quantity", "nope"))
        .rowsRange(1, 100).orderBy("row_id"),
      s"""$lfCte SELECT l_orderkey, l_linenumber, l_quantity, row_id FROM lf
         | WHERE row_id <= 100 ORDER BY row_id""".stripMargin),

    // -- csv open end-to-end (R/lazy.frame.R:37-108): probe + header
    //    autodetect + skip=2 + na.strings + quoted separators, through the
    //    skip-materialize path, against DuckDB read_csv on the SAME file --
    "lf_csv_open" -> Q(
      (s, _) => {
        val path = ensureCsvFixture()
        LazyFrame.csv(s, path, skip = 2, rowOrder = Seq("id"))
          .filter(col("id").isNotNull)
          .select("id", "val", "name", "row_id")
          .orderBy("row_id")
      },
      // WHERE mirrors the Spark side's isNotNull guard exactly (ADVICE r7:
      // a no-op on this fixture, but the two engines must express identical
      // semantics, not coincidentally-equal results)
      s"""WITH lf AS (
         |  SELECT *, row_number() OVER (ORDER BY id) AS row_id
         |  FROM read_csv('$csvFixturePath', skip=2, header=true, nullstr='NA',
         |    columns={'id': 'BIGINT', 'val': 'DOUBLE', 'name': 'VARCHAR'})
         |)
         |SELECT id, val, name, row_id FROM lf WHERE id IS NOT NULL ORDER BY row_id""".stripMargin),

    // -- gz open (zlib vtable, src/lazy.frame.c:43-74): the same probe +
    //    skip + na.strings semantics through a gzip stream on BOTH engines
    //    (Spark via the Hadoop codec, DuckDB natively by extension) --
    "lf_csv_gz" -> Q(
      (s, _) => {
        val path = ensureCsvGzFixture()
        LazyFrame.csv(s, path, skip = 2, rowOrder = Seq("id"))
          .filter(col("id").isNotNull)
          .select("id", "val", "name", "row_id")
          .orderBy("row_id")
      },
      s"""WITH lf AS (
         |  SELECT *, row_number() OVER (ORDER BY id) AS row_id
         |  FROM read_csv('$csvGzFixturePath', skip=2, header=true, nullstr='NA',
         |    columns={'id': 'BIGINT', 'val': 'DOUBLE', 'name': 'VARCHAR'})
         |)
         |SELECT id, val, name, row_id FROM lf WHERE id IS NOT NULL ORDER BY row_id""".stripMargin),

    // -- European locale (read.table dec=',' + sep=';'): exercises the
    //    string-parse-and-cast path (dec != '.') against DuckDB's native
    //    decimal_separator --
    "lf_csv_locale" -> Q(
      (s, _) => {
        val path = ensureCsvLocaleFixture()
        LazyFrame.csv(s, path, sep = ";", dec = ',', rowOrder = Seq("id"))
          .filter(col("id").isNotNull)
          .select("id", "val", "name", "row_id")
          .orderBy("row_id")
      },
      s"""WITH lf AS (
         |  SELECT *, row_number() OVER (ORDER BY id) AS row_id
         |  FROM read_csv('$csvLocaleFixturePath', delim=';', header=true,
         |    nullstr='NA', decimal_separator=',',
         |    columns={'id': 'BIGINT', 'val': 'DOUBLE', 'name': 'VARCHAR'})
         |)
         |SELECT id, val, name, row_id FROM lf WHERE id IS NOT NULL ORDER BY row_id""".stripMargin),

    // -- row.names=1 (R/lazy.frame.R:53-58): the designated column leaves
    //    the data columns (positional addressing shifts past it,
    //    src/lazy.frame.c:632-636) and surfaces as trailing row_names --
    "lf_csv_rownames" -> Q(
      (s, _) => {
        val path = ensureCsvRowNamesFixture()
        LazyFrame.csv(s, path, rowOrder = Seq("id"), rowNames = Some(1))
          .rowsRange(1, 60)
          .orderBy("row_id")
      },
      s"""WITH lf AS (
         |  SELECT *, row_number() OVER (ORDER BY id) AS row_id
         |  FROM read_csv('$csvRowNamesFixturePath', header=true, nullstr='NA',
         |    columns={'rn': 'VARCHAR', 'id': 'BIGINT', 'val': 'DOUBLE'})
         |)
         |SELECT id, val, rn AS row_names, row_id FROM lf
         | WHERE row_id BETWEEN 1 AND 60 ORDER BY row_id""".stripMargin),

    // -- JSONL open (sources.Jsonl — the training-corpus interchange
    //    format, LazyFrame contract: ≤5-line driver probe, pinned schema,
    //    row addressing) vs DuckDB read_json on the SAME file --
    "lf_jsonl_open" -> Q(
      (s, _) => {
        val path = ensureJsonlFixture()
        graft.sources.Jsonl.open(s, path, rowOrder = Seq("id"))
          .filter(col("id").isNotNull)
          .select("id", "score", "tag", "row_id")
          .orderBy("row_id")
      },
      s"""WITH lf AS (
         |  SELECT *, row_number() OVER (ORDER BY id) AS row_id
         |  FROM read_json('$jsonlFixturePath', format='newline_delimited',
         |    columns={'id': 'BIGINT', 'score': 'DOUBLE', 'tag': 'VARCHAR'})
         |)
         |SELECT id, score, tag, row_id FROM lf WHERE id IS NOT NULL
         |ORDER BY row_id""".stripMargin),

    // -- ORC open (LazyFrame.orc — footer schema, pushdown/pruning like
    //    parquet): documents written ONCE per (session, dir) to an ORC
    //    table under target/, re-opened through the LazyFrame contract,
    //    filter+extract with row addressing. DuckDB has no ORC reader, so
    //    the oracle runs the same filter over the SOURCE parquet — the
    //    round trip (parquet → ORC → LazyFrame) must be value-lossless
    //    for the row to hash-match. --
    "lf_orc_open" -> Q(
      (s, d) => docsOrc(s, d)
        .filter(col("n_chars") > 500)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("row_id"))
        .orderBy("row_id"),
      """WITH lf AS (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (ORDER BY doc_id) AS row_id
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, row_id FROM lf
        |WHERE n_chars > 500 ORDER BY row_id""".stripMargin),

    // -- column_attr APPLICATION (R/lazy.frame.R:167-178, man/column_attr
    //    .Rd:43-64): pinned factor levels recode out-of-level values to NA
    //    on every extraction, replayed by the oracle as CASE-IN --
    "lf_column_attr" -> Q(
      (s, _) => {
        val path = ensureCsvFixture()
        val meta = new org.apache.spark.sql.types.MetadataBuilder()
          .putStringArray("levels", Array("n1", "n2", "n3", "n4")).build()
        LazyFrame.csv(s, path, skip = 2, rowOrder = Seq("id"))
          .withColumnAttr("name", meta)
          .filter(col("id").isNotNull)
          .select("id", "name", "row_id")
          .orderBy("row_id")
      },
      s"""WITH lf AS (
         |  SELECT *, row_number() OVER (ORDER BY id) AS row_id
         |  FROM read_csv('$csvFixturePath', skip=2, header=true, nullstr='NA',
         |    columns={'id': 'BIGINT', 'val': 'DOUBLE', 'name': 'VARCHAR'})
         |)
         |SELECT id,
         |  CASE WHEN name IN ('n1','n2','n3','n4') THEN name END AS name,
         |  row_id
         |FROM lf WHERE id IS NOT NULL ORDER BY row_id""".stripMargin),

    // -- dimnames set with make.names sanitization (R/lazy.frame.R:110-113):
    //    invalid chars become '.', numbering survives the rename because the
    //    shared index rebuilds against the renamed order key --
    "lf_rename" -> Q(
      (s, _) => {
        val path = ensureCsvFixture()
        LazyFrame.csv(s, path, skip = 2, rowOrder = Seq("id"))
          .renameColumns(Seq("Doc Id", "the val", "name"))
          .rowsRange(1, 60)
          .orderBy("row_id")
      },
      s"""WITH lf AS (
         |  SELECT *, row_number() OVER (ORDER BY id) AS row_id
         |  FROM read_csv('$csvFixturePath', skip=2, header=true, nullstr='NA',
         |    columns={'id': 'BIGINT', 'val': 'DOUBLE', 'name': 'VARCHAR'})
         |)
         |SELECT id AS "Doc.Id", val AS "the.val", name, row_id
         |FROM lf WHERE row_id BETWEEN 1 AND 60 ORDER BY row_id""".stripMargin),

    // -- dim/nrow/ncol (O(1) after cached count, R/lazy.frame.R:206-209) --
    "lf_dim" -> Q(
      (s, d) => {
        val f = li(s, d)
        val (r, c) = f.dim
        s.range(1).select(lit(r).as("nrow"), lit(c.toLong).as("ncol"))
      },
      "SELECT count(*) AS nrow, CAST(11 AS BIGINT) AS ncol FROM lineitem"),

    // -- str (R str.lazy.frame, R/lazy.frame.R:121-124): the FORMATTED
    //    structure dump, line-exact. Spark renders from its own schema +
    //    index count; the oracle rebuilds every line from DuckDB's view of
    //    the SAME parquet footer (DESCRIBE) and count(*), mapping DuckDB
    //    type names to Spark simpleStrings — a real differential on the
    //    schema both engines read, not a pinned constant. (rowOrder in the
    //    header is the query's own parameter, like any filter literal.) --
    "lf_str" -> Q(
      (s, d) => {
        import s.implicits._
        li(s, d).str().split("\n", -1).toSeq.zipWithIndex
          .map { case (l, i) => (i + 1, l) }
          .toDF("line_no", "line").orderBy("line_no")
      },
      s"""WITH cols AS (
         |  SELECT row_number() OVER () AS pos, column_name,
         |    CASE column_type
         |      WHEN 'BIGINT' THEN 'bigint' WHEN 'INTEGER' THEN 'int'
         |      WHEN 'DOUBLE' THEN 'double' WHEN 'VARCHAR' THEN 'string'
         |      WHEN 'TIMESTAMP' THEN 'timestamp_ntz' WHEN 'DATE' THEN 'date'
         |      WHEN 'BOOLEAN' THEN 'boolean' ELSE lower(column_type) END AS st
         |  FROM (DESCRIBE SELECT * FROM lineitem)),
         |n AS (SELECT count(*) AS c FROM lineitem)
         |SELECT line_no, line FROM (
         |  SELECT 1 AS line_no,
         |    'lazy frame: ' || c || ' obs. of ' || (SELECT count(*) FROM cols)
         |    || ' variables (rowOrder=${rowOrderKey.mkString(",")})' AS line FROM n
         |  UNION ALL
         |  SELECT (pos + 1)::INT, ' $$ ' || column_name || ': ' || st FROM cols)
         |ORDER BY line_no""".stripMargin),

    // -- print (print.lazy.frame, R/lazy.frame.R:255-261): header + column
    //    row + head(3) rows tab-joined + more-rows footer, line-exact over
    //    a stable int/string projection (double/timestamp rendering is
    //    engine-specific — their VALUES are oracle-checked by every other
    //    lf row; print pins the FORMAT). --
    "lf_print" -> Q(
      (s, d) => {
        import s.implicits._
        li(s, d).select(Seq("l_linenumber", "l_returnflag"))
          .printFrame(3).split("\n", -1).toSeq.zipWithIndex
          .map { case (l, i) => (i + 1, l) }
          .toDF("line_no", "line").orderBy("line_no")
      },
      s"""$lfCte, n AS (SELECT count(*) AS c FROM lineitem)
         |SELECT line_no, line FROM (
         |  SELECT 1 AS line_no,
         |    'A lazy frame with ' || c || ' rows and 2 columns' AS line FROM n
         |  UNION ALL
         |  SELECT 2, 'l_linenumber' || chr(9) || 'l_returnflag' || chr(9) || 'row_id'
         |  UNION ALL
         |  SELECT (2 + row_id)::INT,
         |    l_linenumber::VARCHAR || chr(9) || l_returnflag || chr(9) || row_id::VARCHAR
         |  FROM lf WHERE row_id <= 3
         |  UNION ALL
         |  SELECT 6, '(' || (c - 3) || ' more rows not displayed)' FROM n)
         |ORDER BY line_no""".stripMargin),

    // -- summary (stub in reference R/lazy.frame.R:115-119; real here) --
    "lf_stats" -> Q(
      (s, d) => li(s, d).df.agg(
        count(lit(1)).as("n"),
        Norm.dsum(col("l_quantity")).as("sum_qty"),
        Norm.davg(col("l_quantity")).as("avg_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        Norm.dsum(col("l_extendedprice")).as("sum_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price")),
      """SELECT count(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        | FROM lineitem""".stripMargin)
  )

  /** The driver's smoke entry: the reference flagship (filtered extraction). */
  def flagship(s: SparkSession, d: String): DataFrame =
    proj(li(s, d).filter(col("l_quantity") > 30.0)).orderBy("row_id")
}
