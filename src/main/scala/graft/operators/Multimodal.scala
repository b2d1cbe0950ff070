package graft.operators

import graft.functions.{GraftFunctions, TextHashes}
import graft.functions.{GraftFunctions => GF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by native per-row kernels.
  *
  * Still images decode FOR REAL: BMP via a pure-JVM header parse
  * ([[graft.functions.TextHashes.bmpField]]) and PNG/JPEG/GIF via the
  * JDK's own `javax.imageio` readers ([[graft.functions.ImageCodec]] —
  * header-only dim probes plus full pixel decode; no external codec libs).
  * VIDEO decodes for real too, as MJPEG in an AVI container
  * ([[graft.functions.VideoCodec]] — pure-JVM RIFF walk; frames are plain
  * JPEGs through the same ImageIO path). Only genuinely unknown codecs
  * (the planted EBML-magic rows — nothing in this engine parses Matroska) take the
  * documented fallback, with `TextHashes.fakeDim`'s deterministic
  * pseudo-dimensions as the clearly-marked splice point where a real
  * external decoder would attach. The Spark-side plumbing is what
  * matters at scale: schema (binary payload + metadata struct) and
  * decode/feature extraction as `StaticInvoke` Catalyst expressions over
  * the binary column — the whole feature table is one narrow
  * whole-stage-codegen projection over the scan, no shuffle, no RDD round
  * trip.
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

  /** Deterministic frame sampling over a binary payload — the video/audio
    * pipeline primitive (sample N frames per clip for feature extraction):
    * frame k of F starts at byte `floor(n_bytes·k/F)`; the "frame" here is
    * the 16-byte window at that offset (a real decoder would seek codec
    * frame boundaries — same stub splice point as [[extractFeatures]]).
    * Per-row `posexplode`, zero shuffle; emits the window hex-encoded plus
    * an md5 frame digest (the per-frame dedup key). Everything — offsets,
    * window clipping at payload end, digest-of-hex — is replayed by the
    * SQL oracle. */
  def frameSample(docs: DataFrame, idCol: String, blobCol: String, frames: Int = 4): DataFrame = {
    val withOff = docs
      .select(col(idCol).cast("long").as("doc_id"), col(blobCol).as("__b"),
        length(col(blobCol)).cast("long").as("n_bytes"))
      .where(col("n_bytes") > 0)
      .select(col("doc_id"), col("n_bytes"), col("__b"),
        posexplode(transform(sequence(lit(0), lit(frames - 1)),
          k => floor(col("n_bytes") * k / lit(frames)).cast("long") + 1))
          .as(Seq("frame_ix", "off")))
    withOff
      .withColumn("frame_hex",
        hex(call_function("substring", col("__b"), col("off").cast("int"), lit(16))))
      .select(col("doc_id"), col("frame_ix").cast("long").as("frame_ix"),
        col("off"), col("frame_hex"),
        md5(col("frame_hex").cast("binary")).as("frame_digest"))
  }

  /** Resize planning over the (stub-)decoded dimensions: fit the media
    * into a `target`×`target` box preserving aspect ratio — the arithmetic
    * every image/video preprocessing stage runs before the actual decoder
    * resample (which lives behind the same stub splice point as decode).
    * Output dims are `max(1, floor(dim·s))` with `s = target/max(w,h)`
    * (never upscale: `s` capped at 1) — pure integer/double arithmetic,
    * replayed exactly by the SQL oracle. */
  def resizePlan(docs: DataFrame, idCol: String, blobCol: String, target: Int = 64): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val w = GF.fakeDim(col(blobCol), 0).cast("double")
    val h = GF.fakeDim(col(blobCol), 1).cast("double")
    val s = least(lit(1.0), lit(target.toDouble) / greatest(w, h))
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      w.cast("int").as("src_w"), h.cast("int").as("src_h"),
      round(s, 6).as("scale"),
      greatest(lit(1L), floor(w * s)).cast("int").as("out_w"),
      greatest(lit(1L), floor(h * s)).cast("int").as("out_h"))
  }

  /** Little-endian hex of the low 32 bits of `v` (negatives take their
    * two's-complement image — how a BMP header stores a top-down height). */
  private def le32hex(v: Column): Column = {
    val h = lpad(hex(pmod(v.cast("long"), lit(4294967296L))), 8, "0")
    concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2))
  }

  private def le16hex(v: Column): Column = {
    val h = lpad(hex(v.cast("long")), 4, "0")
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }

  /** Synthesize REAL media payloads (the container ships no sample media):
    * every third document becomes a valid `image/bmp` — a byte-exact
    * 54-byte BITMAPINFOHEADER (magic, little-endian size/width/height/
    * bit-depth, doc_id-derived dims, every 21st stored top-down via a
    * negative height) followed by the text bytes as pixel data; the rest
    * stay `text/plain`. Built with hex-string concat + `unhex` so the
    * whole construction stays inside whole-stage codegen AND is replayable
    * hex-for-hex by the SQL oracle. */
  def synthesizeBmp(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val body = col(textCol).cast("binary")
    val w = lit(16L) + id % 497
    val hMag = lit(16L) + id % 293
    val hField = when(id % 21 === 0, -hMag).otherwise(hMag)
    val bpp = when(id % 2 === 0, lit(24L)).otherwise(lit(8L))
    val headerHex = concat(
      lit("424D"), le32hex(lit(54L) + length(body)), lit("0000000036000000"),
      lit("28000000"), le32hex(w), le32hex(hField), lit("0100"), le16hex(bpp),
      lit("0" * 48)) // compression..clrImportant: six zero int32 fields
    docs
      .withColumn("mime", when(id % 3 === 0, lit("image/bmp")).otherwise(lit("text/plain")))
      .withColumn("payload",
        when(id % 3 === 0, unhex(concat(headerHex, hex(body)))).otherwise(body))
  }

  /** Synthesize mixed-codec media via [[graft.functions.ImageCodec]]: the
    * id%4 cycle plants PNG / JPEG / GIF (real `ImageIO.write` encodings of
    * a solid image with doc_id-derived dims and color) a real ISO-BMFF box
    * tree (Mp4Codec) and a planted EBML-magic unknown for the video rows.
    * The write path (encoder) and the read path
    * ([[decodeMedia]]'s header probe + pixel decode) are independent codec
    * implementations, so the arithmetic oracle over doc_id checks a real
    * encode→decode round trip. */
  def synthesizeMedia(docs: DataFrame, idCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val id = col(idCol).cast("long")
    docs
      .withColumn("mime",
        when(id % 8 === 3, lit("video/avi")) // real MJPEG/AVI container
          .when(id % 16 === 7, lit("video/mp4")) // real ISO-BMFF metadata
          .when(id % 16 === 15, lit("video/x-unknown")) // stub fallback row
          .otherwise(element_at(
            array(lit("image/png"), lit("image/jpeg"), lit("image/gif")),
            (id % 4 + 1).cast("int"))))
      .withColumn("payload", GF.synthImage(id))
  }

  /** Decode a mixed-codec media column with the JDK's own ImageIO readers:
    * PNG / JPEG / GIF / BMP dims come from a header-only probe (no pixel
    * pass), plus a full frame-0 pixel decode for LOSSLESS codecs (the
    * top-left RGB — JPEG pixel values are decoder-dependent, so the lossy
    * row reports NULL and the oracle checks its dims only). MJPEG/AVI
    * video decodes FOR REAL ([[graft.functions.VideoCodec]] — RIFF header
    * probe for dims, frames are plain JPEG): codec 'mjpeg', dims from
    * `avih`; MP4 rows probe their ISO-BMFF metadata for real (Mp4Codec box
    * walk: codec 'mp4', tkhd dims — pixels stay undecodable, no MP4 video
    * codec in the JDK). Only genuinely unknown payloads (the planted
    * EBML-magic rows) take the documented stub fallback (codec 'stub',
    * dims 0). Dispatch is per-row byte-magic sniffing, not the
    * mime column, and readers are cached per thread — the shape a 100 TB
    * multi-codec decode stage keeps. */
  def decodeMedia(df: DataFrame, idCol: String, blobCol: String, mimeCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val b = col(blobCol)
    val code = GF.imageField(b, 2)
    val lossless = code === 1 || code === 3 || code === 4 // png, gif, bmp
    val isImg = code =!= lit(graft.functions.ImageCodec.NOT_IMAGE)
    val aviW = GF.aviField(b, 0)
    val isAvi = aviW =!= lit(graft.functions.VideoCodec.NOT_AVI)
    val mp4W = GF.mp4Field(b, 0)
    val isMp4 = mp4W =!= lit(graft.functions.Mp4Codec.NOT_MP4)
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(mimeCol).as("mime"),
      when(code === 1, "png").when(code === 2, "jpeg").when(code === 3, "gif")
        .when(code === 4, "bmp").when(isAvi, "mjpeg").when(isMp4, "mp4")
        .otherwise("stub").as("codec"),
      when(isImg, GF.imageField(b, 0)).when(isAvi, aviW).when(isMp4, mp4W)
        .otherwise(lit(0)).as("width"),
      when(isImg, GF.imageField(b, 1)).when(isAvi, GF.aviField(b, 1))
        .when(isMp4, GF.mp4Field(b, 1)).otherwise(lit(0)).as("height"),
      // AVI frames are JPEG (lossy) — pixel0 stays NULL by the same contract
      when(lossless, GF.imagePixel0(b)).otherwise(lit(null).cast("int")).as("pixel0"))
  }

  /** Real video frame table: split each MJPEG/AVI payload into its frame
    * JPEGs ([[graft.functions.VideoCodec.aviFrames]]) and decode every
    * frame's header through the SAME ImageIO path still images use — the
    * container walk and the frame decode are independent implementations
    * whose agreement (and agreement with the doc_id arithmetic that built
    * the container) the oracle checks. Per-row `posexplode`, zero shuffle:
    * the frame table is one codegen projection over the scan — the shape a
    * 100 TB frame-sampling stage keeps. Non-AVI payloads split to zero
    * frames and drop out. */
  def videoFrames(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).cast("long").as("doc_id"),
        GF.aviField(col(blobCol), 2).as("declared_frames"),
        posexplode(GF.aviFrames(col(blobCol))).as(Seq("frame_ix", "fb")))
      .select(col("doc_id"), col("frame_ix").cast("long").as("frame_ix"),
        col("declared_frames"),
        GF.imageField(col("fb"), 0).as("frame_w"),
        GF.imageField(col("fb"), 1).as("frame_h"),
        GF.imageField(col("fb"), 2).as("fmt_code"))
  }

  /** Decode the media column: a REAL pure-JVM BMP header parse
    * ([[TextHashes.bmpField]] — little-endian width/height/bit-depth,
    * negative height ⇒ top-down pixel order) for payloads with the 'BM'
    * magic; PNG/JPEG/GIF payloads decode through the ImageIO header probe
    * ([[graft.functions.ImageCodec]]); only video/unknown bytes fall back
    * to the documented stub dims. Codec dispatch is per-row on the bytes
    * themselves (magic sniffing, not trusting the mime column) and the
    * whole projection stays one narrow codegen pass — the dispatch shape a
    * real multi-codec decode stage keeps at 100 TB. */
  def decode(df: DataFrame, idCol: String, blobCol: String, mimeCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val b = col(blobCol)
    val wRaw = GF.bmpField(b, 0)
    val hRaw = GF.bmpField(b, 1)
    val isBmp = wRaw =!= lit(TextHashes.NOT_BMP)
    val icode = GF.imageField(b, 2)
    val isIio = icode.isin(1, 2, 3) // png/jpeg/gif via ImageIO (bmp parsed above)
    // bfSize is uint32: reinterpret the raw header bits before comparing,
    // else a >2 GiB declared size wraps negative and hides the truncation
    val declared = GF.bmpField(b, 3).cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(mimeCol).as("mime"),
      when(isBmp, lit("bmp"))
        .when(icode === 1, "png").when(icode === 2, "jpeg").when(icode === 3, "gif")
        .otherwise(lit("stub")).as("codec"),
      when(isBmp, wRaw).when(isIio, GF.imageField(b, 0)).otherwise(GF.fakeDim(b, 0)).as("width"),
      when(isBmp, abs(hRaw)).when(isIio, GF.imageField(b, 1)).otherwise(GF.fakeDim(b, 1)).as("height"),
      when(isBmp, hRaw < 0).otherwise(lit(false)).as("top_down"),
      when(isBmp, GF.bmpField(b, 2)).otherwise(lit(0)).as("bit_depth"),
      // header dims of a truncated file are untrustworthy — say so rather
      // than silently reporting full dims for missing pixel data
      when(isBmp, declared > length(b).cast("long")).otherwise(lit(false))
        .as("truncated"),
      length(b).cast("long").as("n_bytes"))
  }

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
