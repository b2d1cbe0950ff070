package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * All tables load directly except `events`, whose `ts` column has shipped
  * under THREE encodings across testdata generations: TIMESTAMP(NANOS)
  * (read as a raw long via `spark.sql.legacy.parquet.nanosAsLong` — Spark
  * has no nanosecond timestamp type), TIMESTAMP(MICROS, isAdjustedToUTC=
  * false) (Spark's TimestampNTZType — the pandas/arrow default), and plain
  * TIMESTAMP(MICROS). [[normalizeEventTs]] branches on the STORED type and
  * exposes a uniform pair: exact epoch nanos (`ts_ns: long`) and a
  * microsecond-precision TimestampType `ts` (truncation, matching what
  * DuckDB sees reading the same file at its native microsecond precision;
  * the session is UTC-pinned so the NTZ wall-clock cast is lossless).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case n        => spark.read.parquet(s"$sfDir/$n.parquet")
    }

  def region(spark: SparkSession, d: String): DataFrame     = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame     = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame   = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame     = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame   = load(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame  = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** events with `ts_ns: long` (exact) and `ts: timestamp` (us precision). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Normalize any of the three observed `ts` storage encodings to the
    * engine contract (`ts: TimestampType` at us precision + `ts_ns: long`
    * exact epoch nanos). Shared by the batch loader and the streaming
    * source so the two can never diverge on encoding again. */
  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame = {
    val normalized = raw.schema("ts").dataType match {
      case LongType => // nanos-as-long path; integer div — double division
        // loses precision at 1e18 nanos
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampNTZType => // micros, no zone: UTC-pinned session makes
        // the wall-clock → instant cast exact
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _: TimestampType => // engine already truncated for us
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
    // Canonical column order regardless of which encoding arm ran: the
    // stored order with `ts` normalized IN PLACE and `ts_ns` appended last.
    // Without this the LongType arm emits (…, ts_ns, …, ts) while the
    // timestamp arms emit (…, ts, …, ts_ns) — harmless for the registered
    // queries (all select by name) but a positional/select-* consumer would
    // silently diverge across testdata generations (ADVICE r11).
    normalized.select(raw.columns.map(col).toIndexedSeq :+ col("ts_ns"): _*)
  }
}
