package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table (north-star extension —
  * the reference has zero streaming surface, SURVEY.md §1.5).
  *
  * Design: declare transforms once, run them either as a real streaming
  * query (file source → memory sink, `Trigger.AvailableNow`) or as a batch
  * frame — Structured Streaming's core property is exactly that parity, and
  * the DuckDB oracle checks the streaming output against batch SQL.
  *
  * Scale notes: event-time windowed aggregation shuffles once on
  * (window, key); state store size is bounded by watermarking; session
  * windows hash-partition by user key, so state is distributed across
  * executors. The memory sink is test plumbing only — production sinks are
  * kafka/parquet/delta `writeStream`.
  */
object EventStreams {

  /** events schema as stored (ts is TIMESTAMP(NANOS) parquet → long). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos (spark.sql.legacy.parquet.nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of the events parquet with `ts` at microsecond
    * precision (exactly what DuckDB sees natively). */
  def readStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet") // file source wants a dir
      .parquet(sfDir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Tumbling event-time windows: count + exact sum per (window, type). */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding event-time windows (width, slide). */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"))

  /** Session windows per user (gap-merged). Works identically as a batch
    * aggregation — which is how the oracle-checked query runs it; the
    * streaming path is exercised in the spec. */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("session_window.start")).as("session_start_us"),
        col("user_id"), col("n"), col("sum_value"))

  /** Run a streaming aggregation to completion against the finite input and
    * return the final result (memory sink, complete mode, AvailableNow). */
  def runToBatch(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
