package graft.sources

import graft.core.LazyFrame
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source — the de-facto interchange format
  * for training-data corpora — opened the LazyFrame way: METADATA-ONLY.
  *
  * `spark.read.json` with no schema scans the ENTIRE input to infer one —
  * the same full-file pass the reference's lazy open exists to avoid
  * (`/root/reference/R/lazy.frame.R:67-84` probes ≤5 rows; `CsvProbe`
  * mirrors that for CSV). Here the schema is inferred from a driver-side
  * ≤`sampleRows`-line sample (gz included — the text reader decodes
  * transparently), pinned, and every later scan reads with that schema:
  * column pruning reaches the JSON parser (it skips unrequested fields),
  * and malformed lines degrade to nulls (PERMISSIVE), the reference's
  * malformed→NAN→no-match contract.
  *
  * Sampling caveat (documented, inherent to any probe): fields absent
  * from the sampled head are absent from the schema; callers with
  * heterogeneous documents pass an explicit schema.
  */
object Jsonl {

  private val SampleRows = 5

  /** Schema from a ≤5-line driver-side sample — no full-file pass. */
  def probe(spark: SparkSession, path: String, sampleRows: Int = SampleRows): StructType = {
    import spark.implicits._
    val lines = spark.read.text(path).limit(sampleRows).collect().map(_.getString(0))
    require(lines.nonEmpty, s"empty input: $path")
    spark.read.json(spark.createDataset(lines.toSeq)).schema
  }

  /** Plain DataFrame over the file with the pinned (probed or given)
    * schema. */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame =
    spark.read
      .schema(schema.getOrElse(probe(spark, path)))
      .option("mode", "PERMISSIVE")
      .json(path)

  /** LazyFrame open: row addressing under a pinned total-order key, same
    * contract as `LazyFrame.csv`/`LazyFrame.parquet`. */
  def open(spark: SparkSession, path: String, rowOrder: Seq[String],
      schema: Option[StructType] = None): LazyFrame =
    LazyFrame.fromDataFrame(read(spark, path, schema), rowOrder)
}
