package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by per-partition batch operators.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * `fakeDecode` below derives deterministic pseudo-features from the raw
  * bytes and is clearly marked as the splice point for a real decoder. The
  * Spark-side plumbing is real and what actually matters at scale: schema
  * (binary payload + metadata struct), partition-batched processing via
  * `mapPartitions` (the Scala analogue of `mapInPandas` — one batch per
  * partition, no per-row UDF overhead), and a narrow no-shuffle plan.
  */
object Multimodal {

  /** Output schema of the feature extractor. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_distinct_bytes", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false),
    StructField("fake_width", IntegerType, nullable = false),
    StructField("fake_height", IntegerType, nullable = false)))

  /** STUB DECODER — replace with a real codec (e.g. JNI image lib) when
    * available. Deterministic: derives pseudo image dimensions from the
    * byte content so tests are stable. */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length
    val w = 64 + (if (n == 0) 0 else (bytes(0) & 0x7F))
    val h = 64 + (if (n < 2) 0 else (bytes(1) & 0x7F))
    (w, h)
  }

  /** Attach a binary payload column (here synthesized from text — the
    * harness tables carry no real media) plus a metadata struct: the shape
    * a real ingest would produce. */
  def withBlob(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit("text/plain").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest")))

  /** Batch feature extraction over the binary column: one pass per
    * partition, byte histogram → distinct count + Shannon entropy +
    * stubbed decode dims. No shuffle; output is a narrow feature table. */
  def extractFeatures(docs: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = docs.sparkSession
    val input = docs.select(col(idCol).cast("long"), col(blobCol))
    val rdd = input.rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val hist = new Array[Long](256)
        var i = 0
        while (i < bytes.length) { hist(bytes(i) & 0xFF) += 1; i += 1 }
        var distinct = 0
        var entropy = 0.0
        val n = bytes.length.toDouble
        var b = 0
        while (b < 256) {
          if (hist(b) > 0) {
            distinct += 1
            val p = hist(b) / n
            entropy -= p * (math.log(p) / math.log(2))
          }
          b += 1
        }
        val (w, h) = fakeDecode(bytes)
        Row(id, bytes.length.toLong, distinct,
          math.rint(entropy * 1e6) / 1e6, w, h)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
