package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (north-star
  * extension): language ID, quality scoring, token counting, document
  * fingerprinting. All are single-pass, per-row, codegen'd expressions — no
  * shuffle at all until an aggregation is requested, so they scale linearly
  * with the corpus. */
object TextAnalysis {

  /** Tiny per-language stopword evidence lists for the n-gram heuristic. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "a", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Language-ID heuristic: CJK codepoints ⇒ zh; else the language with the
    * most stopword-evidence tokens (strict-majority precedence en > de >
    * fr > es); no evidence ⇒ "und" (undetermined). Deterministic and
    * SQL-expressible — the oracle mirrors the same decision tree. */
  def langId(text: Column): Column = {
    // r18: one textFeatures kernel pass replaces the CJK rlike + the
    // tokenize + 4×5 marker-compare array filters (the caller's session
    // must have GraftFunctions registered); same decision tree, counts
    // identical by the kernel's word-run contract
    val f = textFeatures(text)
    val en = element_at(f, 4); val de = element_at(f, 5)
    val fr = element_at(f, 6); val es = element_at(f, 7)
    when(element_at(f, 8) === 1L, "zh")
      .when(en === 0L && de === 0L && fr === 0L && es === 0L, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Sliding token-window chunking (embedding-pipeline preprocessing):
    * windows of `c` tokens at stride `stride` (overlap = c − stride).
    * Per-row transform + posexplode, zero shuffle; a doc with fewer than
    * one token yields no chunks. Output: (doc_id, chunk_ix, n_toks, chunk).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      c: Int, stride: Int): DataFrame = {
    val n = size(col("t"))
    val nChunks = when(n > 0,
      lit(1) + floor((greatest(n - c, lit(0)) + stride - 1) / stride)).otherwise(0)
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .select(col("doc_id"), col("t"), nChunks.cast("int").as("nc"))
      .select(col("doc_id"), col("t"),
        // guard nc=0: sequence(0,-1) would DESCEND and fabricate chunks
        posexplode(when(col("nc") > 0, sequence(lit(0), col("nc") - 1))
          .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_ix"),
        // chunk token count is arithmetic, not a second slice
        least(lit(c), size(col("t")) - col("col") * stride).cast("long").as("n_toks"),
        concat_ws(" ", slice(col("t"), col("col") * stride + 1, lit(c))).as("chunk"))
  }

  /** Content-defined chunking (FastCDC/rsync shape on token streams): a
    * boundary falls after token i wherever md5-60 of the trailing `win`
    * tokens ≡ 0 (mod `mask`); every doc force-closes at n. Boundaries are
    * decided by LOCAL content, so an edit re-cuts only the chunks it
    * touches — the property that keeps chunk-hash dedup stable under
    * insertions (CdcChunkSpec proves it). Boundary detection is one
    * `cdcEnds` StaticInvoke kernel pass per row (TextHashes) — the
    * earlier pure-HOF formulation (filter(sequence) with slice +
    * concat_ws + md5 interpreted per token position) cost 10.3 s on a
    * QUIET sf0.1 bench leg, ~30× this shape. Zero shuffle. Requires
    * `GraftFunctions.register`.
    * Output: (id, chunk_ix, start_tok, end_tok, n_toks, chunk_hash). */
  def cdcChunk(docs: DataFrame, idCol: String, textCol: String,
      win: Int = 8, mask: Int = 16): DataFrame = {
    val t = col("t")
    // r19: the cdcEnds kernel + per-chunk hash work is CPU-bound over one
    // coarse split — spread it (the docsSpread discipline)
    docs
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .where(size(t) > 0)
      .select(col("doc_id"), t, cdcEnds(t, win, mask).as("ends"))
      .select(col("doc_id"), t, col("ends"),
        posexplode(col("ends")).as(Seq("j0", "end_tok")))
      .select(col("doc_id"), col("j0").cast("long").as("chunk_ix"),
        when(col("j0") === 0, lit(1))
          .otherwise(element_at(col("ends"), col("j0")) + 1)
          .cast("long").as("start_tok"),
        col("end_tok").cast("long").as("end_tok"), t)
      .select(col("doc_id"), col("chunk_ix"), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).as("n_toks"),
        md5Hash60(concat_ws(" ",
          slice(t, col("start_tok").cast("int"),
            (col("end_tok") - col("start_tok") + 1).cast("int"))))
          .as("chunk_hash"))
  }

  /** Quality features + a deterministic composite score in [0,1]. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // r18: all four counts come from ONE textFeatures kernel pass instead
    // of lower+split+filter token arrays plus two regexp_counts per row;
    // the derived expressions below are unchanged, so values (and the
    // composite score's float path) are bit-identical
    register(df.sparkSession)
    val f = col("__tf")
    val nChars = element_at(f, 1)
    val nWords = element_at(f, 2)
    val punct = element_at(f, 3)
    val stop = element_at(f, 4)
    df.select(col(idCol), textFeatures(col(textCol)).as("__tf"))
      .select(
      col(idCol),
      nChars.as("n_chars"),
      nWords.as("n_words"),
      punct.as("n_punct"),
      stop.as("n_stopwords"),
      // mean word length: exact int arithmetic then one double divide
      when(nWords > 0, (nChars - nWords + 1).cast("double") / nWords)
        .otherwise(0.0).as("avg_word_len"),
      when(nChars > 0, punct.cast("double") / nChars).otherwise(0.0).as("punct_ratio"),
      when(nWords > 0, stop.cast("double") / nWords).otherwise(0.0).as("stopword_ratio"),
      // composite: length credit + stopword credit - punctuation penalty
      round(
        least(nWords.cast("double") / 100.0, lit(1.0)) * 0.5 +
          when(nWords > 0, least(stop.cast("double") / nWords * 10.0, lit(1.0)))
            .otherwise(0.0) * 0.3 +
          (lit(1.0) - when(nChars > 0, punct.cast("double") / nChars).otherwise(0.0)) * 0.2,
        6).as("quality"))
  }

  /** Token counting: whitespace tokens and a BPE-ish subword regex count
    * (runs of letters / digits / single punctuation — the classic
    * pre-tokenizer shape). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(filter(split(t, " +"), x => x =!= "")).cast("long").as("ws_tokens"),
      regexp_count(t, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")).cast("long").as("bpe_tokens"),
      length(t).cast("long").as("n_chars"))
  }

  /** Content fingerprint: md5 of the normalized text (lowercase, collapsed
    * whitespace) — the exact-dedup key. The edit-robust winnowing
    * fingerprint is `GraftFunctions.winnowFp`. */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))
}
