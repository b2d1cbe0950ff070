package graft

import graft.core.Tables
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Curation operators: repetition signals, domain mixing, contamination. */
class CurationSpec extends SparkSpec {

  test("rep signals: metrics bounded, internally consistent") {
    val out = Curation.all("q_rep_signals").fn(spark, sf0).collect()
    assert(out.length == Tables.documents(spark, sf0).count())
    out.foreach { r =>
      val n = r.getLong(1); val nd = r.getLong(2)
      val dr = r.getDouble(3); val tts = r.getDouble(4)
      val dtf = r.getDouble(5); val tbs = r.getDouble(6)
      assert(n > 0 && nd > 0 && nd <= n)
      assert(math.abs(dr - nd.toDouble / n) < 1e-15)
      assert(tts >= 1.0 / n && tts <= 1.0)
      assert(dtf >= 0.0 && dtf <= 1.0 && tbs >= 0.0 && tbs <= 1.0)
      // every token of a repeated type counts: share of the single
      // heaviest type can never exceed the all-repeated-types fraction
      // (unless nothing repeats and both legitimately diverge)
      if (dtf > 0) assert(tts <= dtf + 1e-15)
    }
  }

  test("mixDomains: deterministic, honors the recipe rates, drops unknown sources") {
    val docs = Tables.documents(spark, sf0)
    val a = Curation.mixDomains(docs, "doc_id", "source", Curation.targetMix)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.mixDomains(docs.repartition(7), "doc_id", "source", Curation.targetMix)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty, "mix must not depend on physical layout")
    // binding sources (rate 1.0) keep every row; capped sources keep ~rate
    val bySrc = Curation.mixDomains(docs, "doc_id", "source", Curation.targetMix)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Curation.targetMix.map { case (s, sh) => full(s) / sh }.min.toLong
    for ((s, sh) <- Curation.targetMix) {
      val rate = sh * n / full(s)
      if (rate >= 1.0) assert(bySrc(s) == full(s), s"$s should keep all rows")
      else {
        val kept = bySrc.getOrElse(s, 0L).toDouble / full(s)
        assert(math.abs(kept - rate) < 0.35, s"$s kept=$kept rate=$rate")
      }
    }
    // a recipe that omits a source drops it entirely
    val partial = Curation.mixDomains(docs, "doc_id", "source",
      Seq("src0" -> 0.5, "src1" -> 0.5))
    assert(partial.select("source").distinct().collect()
      .map(_.getString(0)).toSet == Set("src0", "src1"))
  }

  test("contamination: benchmark docs excluded; self-overlap detected on a planted copy") {
    val out = Curation.all("q_contamination").fn(spark, sf0).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(!ids.exists(_ % 50 == 0), "benchmark docs must not be scored")
    out.foreach { r =>
      val (ng, nh, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(ng > 0 && nh >= 0 && nh <= ng)
      assert(math.abs(c - nh.toDouble / ng) < 1e-15)
    }
    // a verbatim copy of a benchmark doc must score contamination 1.0
    import spark.implicits._
    val bench = Tables.documents(spark, sf0)
      .where(col("doc_id") === 0).select("text").head().getString(0)
    val planted = Seq((0L, bench), (999L, bench), (998L, "totally novel words here"))
      .toDF("doc_id", "text")
    val grams = planted.select(col("doc_id"),
      explode(array_distinct(graft.functions.GraftFunctions.shingles(
        graft.functions.GraftFunctions.tokens(col("text")), 5))).as("g"))
      .select(col("doc_id"), graft.functions.GraftFunctions.md5Hash60(col("g")).as("h"))
    val b = grams.where(col("doc_id") % 50 === 0).select("h").distinct()
    val hits = grams.where(col("doc_id") % 50 =!= 0).join(b, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("nh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(999L) && !hits.contains(998L))
  }

  test("pipeline manifest: stage invariants hold end-to-end") {
    val rows = Curation.pipelineManifest(spark, sf0).collect()
    assert(rows.nonEmpty)
    val docs = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (nDocs, nChunks, nTokens) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nChunks >= nDocs, "every kept doc yields at least one chunk")
      assert(nTokens >= 20L * nDocs, "the quality gate floor survives composition")
    }
    // the exact per-source mix is the ORACLE's check (hash-rank replay);
    // at sf0.001 the per-source survivor counts are single digits, so a
    // ratio assertion would just test binomial noise. Here: determinism.
    val again = Curation.pipelineManifest(spark, sf0).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(docs === again, "the composed pipeline must be deterministic")
  }

  test("temperature mix: corpus size preserved in expectation; tails upsampled") {
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, sf0).where(col("n_chars") >= 300)
    val out = Curation.mixTemperature(base, "doc_id", "source")
    val nIn = base.count()
    val nOut = out.count()
    // E[n_out] = N exactly (rates sum to N); the only noise is the
    // per-doc fractional hash draw
    assert(math.abs(nOut - nIn) <= math.max(4L, nIn / 10),
      s"temperature mix should preserve corpus size in expectation: $nOut vs $nIn")
    // the scarcest source must be upsampled (rate > 1): more replicas
    // than distinct docs
    val bySource = out.groupBy("source")
      .agg(countDistinct("doc_id").as("d"), count(lit(1)).as("o"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val inCounts = base.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val scarcest = inCounts.minBy(_._2)._1
    val (_, d, o) = bySource.find(_._1 == scarcest).get
    assert(o > d, s"scarcest source $scarcest must upsample: $o replicas of $d docs")
    // replica indexes are dense 1..n per doc
    val bad = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("replica_ix").as("mx"), min("replica_ix").as("mn"))
      .where(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(bad === 0L, "replica_ix must be dense 1..n per doc")
  }

  test("decontaminate: planted benchmark span removed, rest of doc survives") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val benchText = "alpha beta gamma delta epsilon" // exactly one 5-gram
    val docs = Seq(
      // doc 1: contaminated span in the middle, clean prefix/suffix
      (1L, s"clean start here now $benchText and a clean tail follows after"),
      (2L, "totally unrelated words that never overlap the benchmark suite"),
      (3L, "alpha beta gamma different tail words")) // 3-token overlap only: no 5-gram hit
      .toDF("doc_id", "text")
    val bench = Seq(Tuple1(benchText)).toDF("g")
      .select(graft.functions.GraftFunctions.md5Hash60(col("g")).as("h"))
    val out = Curation.decontaminate(docs, "doc_id", "text", bench)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((1L,
      "clean start here now and a clean tail follows after", 5L)))
    assert(out(1) == ((2L,
      "totally unrelated words that never overlap the benchmark suite", 0L)))
    assert(out(2) == ((3L, "alpha beta gamma different tail words", 0L)))
  }

  test("decontaminate: overlapping hits union their spans; full wipe allowed") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    // bench doc contributes two overlapping 5-grams (6 tokens)
    val doc = (1L, "a b c d e f")
    val bench = Seq("a b c d e", "b c d e f").toDF("g")
      .select(graft.functions.GraftFunctions.md5Hash60(col("g")).as("h"))
    val out = Curation.decontaminate(Seq(doc).toDF("doc_id", "text"),
        "doc_id", "text", bench)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.head == (("", 6L))) // both spans union to the whole doc
  }
}
