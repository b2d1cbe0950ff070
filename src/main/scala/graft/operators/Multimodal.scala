package graft.operators

import graft.functions.GraftFunctions
import graft.functions.{GraftFunctions => GF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by native per-row kernels.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * `TextHashes.fakeDim` derives deterministic pseudo-dimensions from the
  * raw bytes and is the clearly-marked splice point for a real decoder.
  * The Spark-side plumbing is real and what matters at scale: schema
  * (binary payload + metadata struct) and feature extraction as
  * `StaticInvoke` Catalyst expressions over the binary column — the whole
  * feature table is one narrow whole-stage-codegen projection over the
  * scan, no shuffle, no RDD round trip.
  */
object Multimodal {

  /** Attach a binary payload column (here synthesized from text — the
    * harness tables carry no real media) plus a metadata struct: the shape
    * a real ingest would produce. */
  def withBlob(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit("text/plain").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest")))

  /** Feature extraction over the binary column: byte histogram → distinct
    * count + Shannon entropy (TextHashes kernels, inside codegen) plus the
    * stubbed decode dims. Every feature is also reproducible by the SQL
    * oracle (hex-pair byte explosion + the same entropy formula). */
  def extractFeatures(docs: DataFrame, idCol: String, blobCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      length(col(blobCol)).cast("long").as("n_bytes"),
      GF.distinctBytes(col(blobCol)).as("n_distinct_bytes"),
      GF.byteEntropy(col(blobCol)).as("entropy"),
      GF.fakeDim(col(blobCol), 0).as("fake_width"),
      GF.fakeDim(col(blobCol), 1).as("fake_height"))
  }
}
