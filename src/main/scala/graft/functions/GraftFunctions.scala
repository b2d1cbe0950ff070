package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Registers the graft kernels as native Catalyst expressions.
  *
  * Each function is a `StaticInvoke` of a method in [[TextHashes]]: Catalyst
  * generates a direct static call inside whole-stage codegen — the preferred
  * extension point after built-ins, well ahead of Scala UDFs (which
  * round-trip through external row formats).
  *
  * Registered in the session's FunctionRegistry so both the Column API
  * (via `call_function`) and `spark.sql` can use them.
  */
object GraftFunctions {

  private def invoke(
      out: DataType,
      method: String,
      args: Seq[Expression],
      in: Seq[DataType]): Expression =
    invokeIn(TextHashes.getClass, out, method, args, in)

  private def invokeIn(
      clazz: Class[_],
      out: DataType,
      method: String,
      args: Seq[Expression],
      in: Seq[DataType]): Expression =
    StaticInvoke(
      clazz,
      out,
      method,
      args,
      inputTypes = in,
      propagateNull = true,
      returnNullable = false)

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_minhash",
      (e: Seq[Expression]) => invoke(ArrayType(LongType, containsNull = false), "minhash", e,
        Seq(ArrayType(StringType), IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash",
      (e: Seq[Expression]) => invoke(LongType, "simhash", e,
        Seq(ArrayType(StringType))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_winnow",
      (e: Seq[Expression]) => invoke(ArrayType(LongType, containsNull = false), "winnow", e,
        Seq(ArrayType(StringType), IntegerType, IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine",
      (e: Seq[Expression]) => invoke(DoubleType, "cosineF", e,
        Seq(ArrayType(FloatType), ArrayType(FloatType))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hyperplane_bucket",
      (e: Seq[Expression]) => invoke(IntegerType, "hyperplaneBucket", e,
        Seq(ArrayType(FloatType), IntegerType, IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot",
      (e: Seq[Expression]) => invoke(DoubleType, "dotF", e,
        Seq(ArrayType(FloatType), ArrayType(FloatType))), "scala_udf")
    // md5-derived variants: reproducible by the SQL oracle (see TextHashes)
    reg.createOrReplaceTempFunction("graft_md5_60",
      (e: Seq[Expression]) => invoke(LongType, "md5Hash60", e,
        Seq(StringType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash60",
      (e: Seq[Expression]) => invoke(LongType, "simhash60", e,
        Seq(ArrayType(StringType))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_winnow60",
      (e: Seq[Expression]) => invoke(ArrayType(LongType, containsNull = false), "winnow60", e,
        Seq(ArrayType(StringType), IntegerType, IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_gram_hashes_60",
      (e: Seq[Expression]) => invoke(ArrayType(LongType, containsNull = false), "gramHashes60", e,
        Seq(ArrayType(StringType), IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cdc_ends",
      (e: Seq[Expression]) => invoke(ArrayType(IntegerType, containsNull = false), "cdcEnds", e,
        Seq(ArrayType(StringType), IntegerType, IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_quant_stats",
      (e: Seq[Expression]) => invoke(ArrayType(DoubleType, containsNull = false), "quantStats", e,
        Seq(ArrayType(FloatType))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bucket_fold",
      (e: Seq[Expression]) => invoke(DoubleType, "bucketFold", e,
        Seq(ArrayType(LongType), ArrayType(DoubleType))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_sorted_run_counts",
      (e: Seq[Expression]) => invoke(ArrayType(LongType, containsNull = false), "sortedRunCounts", e,
        Seq(ArrayType(StringType))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hyperplane_bucket_md5",
      (e: Seq[Expression]) => invoke(IntegerType, "hyperplaneBucketMd5", e,
        Seq(ArrayType(FloatType), IntegerType, IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_rand_project",
      (e: Seq[Expression]) => invoke(ArrayType(DoubleType, containsNull = false), "randProject", e,
        Seq(ArrayType(FloatType), IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine_d",
      (e: Seq[Expression]) => invoke(DoubleType, "cosineD", e,
        Seq(ArrayType(DoubleType), ArrayType(DoubleType))), "scala_udf")
    reg.createOrReplaceTempFunction("graft_byte_entropy",
      (e: Seq[Expression]) => invoke(DoubleType, "byteEntropy", e,
        Seq(BinaryType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_distinct_bytes",
      (e: Seq[Expression]) => invoke(IntegerType, "distinctBytes", e,
        Seq(BinaryType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_first_digit",
      (e: Seq[Expression]) => invoke(LongType, "firstDigit", e,
        Seq(LongType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_fake_dim",
      (e: Seq[Expression]) => invoke(IntegerType, "fakeDim", e,
        Seq(BinaryType, IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bmp_field",
      (e: Seq[Expression]) => invoke(IntegerType, "bmpField", e,
        Seq(BinaryType, IntegerType)), "scala_udf")
    // ImageIO-backed still-image codecs (ImageCodec — JDK readers only)
    reg.createOrReplaceTempFunction("graft_image_field",
      (e: Seq[Expression]) => invokeIn(ImageCodec.getClass, IntegerType, "imageField", e,
        Seq(BinaryType, IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_image_pixel0",
      (e: Seq[Expression]) => invokeIn(ImageCodec.getClass, IntegerType, "imagePixel0", e,
        Seq(BinaryType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_synth_image",
      (e: Seq[Expression]) => invokeIn(ImageCodec.getClass, BinaryType, "synthImage", e,
        Seq(LongType)), "scala_udf")
    // MJPEG/AVI container codec (VideoCodec — RIFF walk + ImageIO frames)
    reg.createOrReplaceTempFunction("graft_avi_field",
      (e: Seq[Expression]) => invokeIn(VideoCodec.getClass, IntegerType, "aviField", e,
        Seq(BinaryType, IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_avi_frames",
      (e: Seq[Expression]) => invokeIn(VideoCodec.getClass,
        ArrayType(BinaryType, containsNull = false), "aviFrames", e,
        Seq(BinaryType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_synth_avi",
      (e: Seq[Expression]) => invokeIn(VideoCodec.getClass, BinaryType, "synthAvi", e,
        Seq(LongType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_synth_avi_group",
      (e: Seq[Expression]) => invokeIn(VideoCodec.getClass, BinaryType,
        "synthAviGroup", e, Seq(LongType)), "scala_udf")
    // ISO-BMFF (MP4) metadata codec (Mp4Codec — big-endian box walk)
    reg.createOrReplaceTempFunction("graft_mp4_field",
      (e: Seq[Expression]) => invokeIn(Mp4Codec.getClass, IntegerType, "mp4Field", e,
        Seq(BinaryType, IntegerType)), "scala_udf")
    // RIFF/WAVE PCM audio codec (AudioCodec — little-endian chunk walk)
    reg.createOrReplaceTempFunction("graft_synth_wav",
      (e: Seq[Expression]) => invokeIn(AudioCodec.getClass, BinaryType, "synthWav", e,
        Seq(LongType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_wav_field",
      (e: Seq[Expression]) => invokeIn(AudioCodec.getClass, IntegerType, "wavField", e,
        Seq(BinaryType, IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_wav_sumsq",
      (e: Seq[Expression]) => invokeIn(AudioCodec.getClass, LongType, "wavSumSq", e,
        Seq(BinaryType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_synth_wav_group",
      (e: Seq[Expression]) => invokeIn(AudioCodec.getClass, BinaryType,
        "synthWavGroup", e, Seq(LongType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_audio_fp",
      (e: Seq[Expression]) => invokeIn(AudioCodec.getClass,
        ArrayType(LongType, containsNull = false), "audioFp", e,
        Seq(BinaryType)), "scala_udf")
    // pinned-merge BPE subword tokenizer (TextBpe)
    reg.createOrReplaceTempFunction("graft_bpe",
      (e: Seq[Expression]) => invokeIn(TextBpe.getClass,
        ArrayType(StringType, containsNull = false), "bpe", e,
        Seq(StringType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bpe_count",
      (e: Seq[Expression]) => invokeIn(TextBpe.getClass, LongType, "bpeCount", e,
        Seq(StringType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bpe_with",
      (e: Seq[Expression]) => invokeIn(TextBpe.getClass,
        ArrayType(StringType, containsNull = false), "bpeWith", e,
        Seq(StringType, StringType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bpe_pairs_with",
      (e: Seq[Expression]) => invokeIn(TextBpe.getClass,
        ArrayType(StructType(Seq(
          StructField("pair", StringType, nullable = false),
          StructField("cnt", LongType, nullable = false))),
          containsNull = false), "bpePairsWith", e,
        Seq(StringType, StringType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bpe_pairs",
      (e: Seq[Expression]) => invokeIn(TextBpe.getClass,
        ArrayType(StructType(Seq(
          StructField("pair", StringType, nullable = false),
          StructField("cnt", LongType, nullable = false))),
          containsNull = false), "bpePairs", e,
        Seq(StringType)), "scala_udf")
    // incremental BPE training state (TextBpe, r18): persisted byte-id
    // arrays advanced one merge pass per iteration instead of full
    // re-encodes (BinaryType = primitive columnar-cache path)
    reg.createOrReplaceTempFunction("graft_bpe_char_ids",
      (e: Seq[Expression]) => invokeIn(TextBpe.getClass,
        BinaryType, "bpeCharIds", e, Seq(StringType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bpe_merge_one",
      (e: Seq[Expression]) => invokeIn(TextBpe.getClass,
        BinaryType, "bpeMergeOne", e,
        Seq(BinaryType, IntegerType, IntegerType, IntegerType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bpe_pair_id_counts",
      (e: Seq[Expression]) => invokeIn(TextBpe.getClass,
        ArrayType(StructType(Seq(
          StructField("k", LongType, nullable = false),
          StructField("cnt", LongType, nullable = false))),
          containsNull = false), "bpePairIdCounts", e,
        Seq(BinaryType)), "scala_udf")
    // perceptual image hash (PerceptualHash — dHash over decoded pixels)
    reg.createOrReplaceTempFunction("graft_dhash",
      (e: Seq[Expression]) => invokeIn(PerceptualHash.getClass,
        ArrayType(LongType, containsNull = false), "dhash", e,
        Seq(BinaryType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dhash128",
      (e: Seq[Expression]) => invokeIn(PerceptualHash.getClass,
        ArrayType(LongType, containsNull = false), "dhash128", e,
        Seq(BinaryType)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_synth_pattern_png",
      (e: Seq[Expression]) => invokeIn(PerceptualHash.getClass, BinaryType,
        "synthPatternPng", e, Seq(LongType)), "scala_udf")
    // Unicode NFC normalization (TextHashes.nfc — ASCII fast path)
    reg.createOrReplaceTempFunction("graft_nfc",
      (e: Seq[Expression]) => invoke(StringType, "nfc", e,
        Seq(StringType)), "scala_udf")
    // Jaro-Winkler similarity (TextHashes.jaroWinkler — exact-rational
    // jaro term; cross-checked against DuckDB's independent implementation)
    reg.createOrReplaceTempFunction("graft_jw",
      (e: Seq[Expression]) => invoke(DoubleType, "jaroWinkler", e,
        Seq(StringType, StringType)), "scala_udf")
    // hashed-classifier ordered weight fold (TextHashes.hashedWeightSum,
    // r18): memoized two-md5 token weights, bit-identical to the
    // aggregate(transform(...)) formulation
    reg.createOrReplaceTempFunction("graft_weight_sum",
      (e: Seq[Expression]) => invoke(DoubleType, "hashedWeightSum", e,
        Seq(ArrayType(StringType), IntegerType)), "scala_udf")
    // |a ∩ b| over two DISTINCT long arrays (TextHashes.interCount, r19):
    // ≡ size(array_intersect(a, b)) on the dedup shingle sets without
    // allocating the intersection array per pair
    reg.createOrReplaceTempFunction("graft_inter_count",
      (e: Seq[Expression]) => invoke(LongType, "interCount", e,
        Seq(ArrayType(LongType), ArrayType(LongType))), "scala_udf")
    // single-pass text feature counts (TextHashes.textFeatures, r18):
    // [n_chars, n_words, n_punct, hits_en, hits_de, hits_fr, hits_es, cjk]
    reg.createOrReplaceTempFunction("graft_text_features",
      (e: Seq[Expression]) => invoke(
        ArrayType(LongType, containsNull = false), "textFeatures", e,
        Seq(StringType)), "scala_udf")
  }

  // Column-API wrappers (register(spark) must have been called in the session)
  def minhashSig(c: Column, numHashes: Int): Column =
    call_function("graft_minhash", c, lit(numHashes))
  def simhash64(c: Column): Column = call_function("graft_simhash", c)
  def winnowFp(c: Column, k: Int, w: Int): Column =
    call_function("graft_winnow", c, lit(k), lit(w))
  def cosineSim(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def dotProd(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def md5Hash60(c: Column): Column = call_function("graft_md5_60", c)
  def simhash60(c: Column): Column = call_function("graft_simhash60", c)
  def winnow60(c: Column, k: Int, w: Int): Column =
    call_function("graft_winnow60", c, lit(k), lit(w))
  def gramHashes60(c: Column, k: Int): Column =
    call_function("graft_gram_hashes_60", c, lit(k))
  def cdcEnds(c: Column, win: Int, mask: Int): Column =
    call_function("graft_cdc_ends", c, lit(win), lit(mask))
  def quantStats(c: Column): Column = call_function("graft_quant_stats", c)
  def sortedRunCounts(c: Column): Column =
    call_function("graft_sorted_run_counts", c)
  def bucketFold(hashes: Column, lam: Column): Column =
    call_function("graft_bucket_fold", hashes, lam)
  def randProject(v: Column, r: Int): Column =
    call_function("graft_rand_project", v, lit(r))
  def cosineSimD(a: Column, b: Column): Column = call_function("graft_cosine_d", a, b)
  def byteEntropy(c: Column): Column = call_function("graft_byte_entropy", c)
  def firstDigit(c: Column): Column = call_function("graft_first_digit", c)
  def distinctBytes(c: Column): Column = call_function("graft_distinct_bytes", c)
  def fakeDim(c: Column, idx: Int): Column = call_function("graft_fake_dim", c, lit(idx))
  def bmpField(c: Column, which: Int): Column = call_function("graft_bmp_field", c, lit(which))
  def imageField(c: Column, which: Int): Column = call_function("graft_image_field", c, lit(which))
  def imagePixel0(c: Column): Column = call_function("graft_image_pixel0", c)
  def synthImage(id: Column): Column = call_function("graft_synth_image", id)
  def aviField(c: Column, which: Int): Column = call_function("graft_avi_field", c, lit(which))
  def aviFrames(c: Column): Column = call_function("graft_avi_frames", c)
  def synthAvi(id: Column): Column = call_function("graft_synth_avi", id)
  def synthAviGroup(id: Column): Column = call_function("graft_synth_avi_group", id)
  def mp4Field(c: Column, which: Int): Column = call_function("graft_mp4_field", c, lit(which))
  def synthWav(id: Column): Column = call_function("graft_synth_wav", id)
  def wavField(c: Column, which: Int): Column = call_function("graft_wav_field", c, lit(which))
  def wavSumSq(c: Column): Column = call_function("graft_wav_sumsq", c)
  def synthWavGroup(id: Column): Column = call_function("graft_synth_wav_group", id)
  def audioFp(c: Column): Column = call_function("graft_audio_fp", c)
  def bpeTokens(c: Column): Column = call_function("graft_bpe", c)
  def bpeCount(c: Column): Column = call_function("graft_bpe_count", c)
  def bpeTokensWith(c: Column, spec: String): Column =
    call_function("graft_bpe_with", c, lit(spec))
  def bpePairsWith(c: Column, spec: String): Column =
    call_function("graft_bpe_pairs_with", c, lit(spec))
  def bpePairs(c: Column): Column = call_function("graft_bpe_pairs", c)
  def bpeCharIds(c: Column): Column = call_function("graft_bpe_char_ids", c)
  def bpeMergeOne(ids: Column, aId: Int, bId: Int, newId: Int): Column =
    call_function("graft_bpe_merge_one", ids, lit(aId), lit(bId), lit(newId))
  def bpePairIdCounts(ids: Column): Column =
    call_function("graft_bpe_pair_id_counts", ids)
  def dhash(c: Column): Column = call_function("graft_dhash", c)
  def dhash128(c: Column): Column = call_function("graft_dhash128", c)
  def synthPatternPng(id: Column): Column = call_function("graft_synth_pattern_png", id)
  def nfcNorm(c: Column): Column = call_function("graft_nfc", c)
  def textFeatures(c: Column): Column = call_function("graft_text_features", c)
  def weightSum(toks: Column, numBuckets: Int): Column =
    call_function("graft_weight_sum", toks, lit(numBuckets))
  def interCount(a: Column, b: Column): Column =
    call_function("graft_inter_count", a, b)
  def jaroWinkler(a: Column, b: Column): Column = call_function("graft_jw", a, b)

  /** Lowercase alphanumeric word tokens (both engines: split on
    * `[^a-z0-9]+`, drop empties). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), x => x =!= "")

  /** k-word shingles joined with spaces; empty array if fewer than k
    * tokens. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
      .otherwise(array().cast(ArrayType(StringType)))
}
