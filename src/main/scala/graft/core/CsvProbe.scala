package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The reference's construction-time schema probe, Spark-style: read at most
  * five data rows (driver-side, via a limit that touches only the head of
  * the first file split — gz included) and infer column count, names, types
  * and header presence from them (`R/lazy.frame.R:67-84`).
  *
  * This deliberately avoids `inferSchema=true`, which scans the whole file:
  * a lazy open must be metadata-only (`man/lazy.frame.Rd:31-35`). The schema
  * is then pinned for the frame's lifetime — we consciously diverge from the
  * reference's per-extraction re-inference quirk (SURVEY.md §7.4).
  */
object CsvProbe {

  final case class Probe(
      names: Seq[String],
      types: Seq[DataType],
      headerDetected: Boolean) {
    def schemaWithHeaderNames: StructType =
      StructType(names.zip(types).map { case (n, t) => StructField(n, t) })
    def schemaGenericNames: StructType =
      StructType(types.zipWithIndex.map { case (t, i) => StructField(s"V${i + 1}", t) })
  }

  private val SampleRows = 5

  def probe(spark: SparkSession, path: String, sep: String, skip: Int,
      naStrings: Seq[String] = Seq("NA"), dec: Char = '.'): Probe = {
    val lines = spark.read.text(path)
      .limit(skip + SampleRows + 1)
      .collect()
      .iterator.map(_.getString(0)).drop(skip).toSeq
    require(lines.nonEmpty, s"empty input: $path")

    def infer(s: String) = inferTypeNa(s, naStrings.toSet, dec)
    val cells = lines.map(splitLine(_, sep))
    val ncol = cells.head.length
    val first = cells.head.map(infer)
    val rest = cells.tail.filter(_.length == ncol)

    // Header heuristic (cf. R/lazy.frame.R:76-79): the first row is a header
    // if it is all-string while some later row has a numeric in a column.
    val restTypes: Seq[DataType] =
      if (rest.isEmpty) first
      else (0 until ncol).map(i => mergeTypes(rest.map(r => infer(r(i)))))
    val headerDetected = rest.nonEmpty &&
      first.forall(_ == StringType) &&
      restTypes.exists(t => t == LongType || t == DoubleType)

    val dataRows = if (headerDetected) rest else cells.filter(_.length == ncol)
    val types: Seq[DataType] =
      if (dataRows.isEmpty) Seq.fill(ncol)(StringType)
      else (0 until ncol).map(i => mergeTypes(dataRows.map(r => infer(r(i)))))
    val names =
      if (headerDetected) LazyFrame.makeNames(cells.head.map(stripQuotes))
      else (1 to ncol).map(i => s"V$i")
    Probe(names, types, headerDetected)
  }

  /** Minimal quote-aware split (the reference's filter path dequotes crudely
    * too — `strip_nl_and_dequote`, `src/lazy.frame.c:465-497`; full quoting
    * is handled by the real CSV parser at scan time). */
  private[graft] def splitLine(line: String, sep: String): Seq[String] = {
    val s = sep.head
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    line.foreach {
      case '"' => inQ = !inQ; cur += '"'
      case c if c == s && !inQ => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result()
  }

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.head == '"' && t.last == '"') t.substring(1, t.length - 1) else t
  }

  private[graft] def inferType(raw: String): DataType =
    inferTypeNa(raw, Set("NA"), '.')

  /** Type inference aware of the caller's NA markers and decimal separator
    * (read.table's `na.strings`/`dec` passthrough, `R/lazy.frame.R:89-108`). */
  private[graft] def inferTypeNa(raw: String, na: Set[String], dec: Char): DataType = {
    val s0 = stripQuotes(raw)
    if (s0.isEmpty || na.contains(s0)) NullType
    else {
      val s = if (dec != '.') s0.replace(dec, '.') else s0
      if (s.matches("[+-]?\\d+")) LongType
      else if (scala.util.Try(s.toDouble).isSuccess) DoubleType
      else StringType
    }
  }

  private[graft] def mergeTypes(ts: Seq[DataType]): DataType =
    ts.foldLeft(NullType: DataType) {
      case (NullType, t) => t
      case (t, NullType) => t
      case (a, b) if a == b => a
      case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
      case _ => StringType
    } match {
      case NullType => StringType
      case t => t
    }
}
