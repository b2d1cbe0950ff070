package graft

import graft.operators.Scoring
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** BM25 / hashed classifier / duplicated-span fraction: semantic checks
  * plus the plan shapes the operators are designed around (stats
  * broadcast for BM25, shuffle-free classifier scan, hash-only shuffle
  * for the span signal). */
class ScoringSpec extends SparkSpec {

  private def run(name: String): DataFrame = Scoring.all(name).fn(spark, sf0)

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("bm25: top-k is sorted, bounded, and positive") {
    val rows = run("q_bm25").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val scores = rows.map(_.getDouble(2))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sortBy(-_)), "descending by score")
  }

  test("bm25 plan: corpus stats broadcast; no corpus-wide hash shuffle") {
    val p = plan(run("q_bm25"))
    assert(p.contains("BroadcastExchange"), s"stats must broadcast:\n$p")
    assert(!p.contains("Arguments: hashpartitioning"),
      s"corpus must not shuffle for a broadcast-stats score:\n$p")
  }

  test("classifier: per-row fold, mean weight bounded, keep consistent") {
    val rows = run("q_quality_classifier").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, wSum, score) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(wSum) <= n.toDouble, "each weight is in [-1, 1]")
      assert(score === wSum / n)
      assert(r.getBoolean(5) === (score > 0.0))
      val prob = r.getDouble(4)
      assert(prob > 0.0 && prob < 1.0)
    }
  }

  test("classifier plan: zero exchanges before the presentation sort") {
    val p = plan(run("q_quality_classifier"))
    assert(!p.contains("Arguments: hashpartitioning"),
      s"classifier is a pure scan; no shuffle allowed:\n$p")
  }

  test("dup-span fraction: in [0,1]; the earliest doc of any span is never dup") {
    val rows = run("q_dup_span_frac").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val frac = r.getDouble(3)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
    // at least one doc fully novel (the smallest doc_id can't be a dup of
    // anything earlier)
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(2) === 0L)
  }

  test("dup-span plan: one corpus scan (window owner, no self-join)") {
    val p = plan(run("q_dup_span_frac"))
    val tree = p.split("\n\n")(0)
    assert("Scan parquet".r.findAllIn(tree).size === 1,
      s"span signal must derive the explode once:\n$p")
  }

  test("entropy: bounds [0, ln n_distinct]; uniform-repetition lowers it") {
    val rows = run("q_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, h) = (r.getLong(2), r.getDouble(3))
      assert(h >= 0.0 && h <= math.log(nd.toDouble) + 1e-6,
        s"entropy $h outside [0, ln($nd)]")
      assert(r.getBoolean(4) === (h < 2.0))
    }
  }

  test("shift-invariant excision catches the offset duplicate the aligned grid misses") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    // doc 0: 64 unique tokens; doc 1: 3 filler tokens, then an exact copy
    // of doc 0's tokens [0, 16), then unique filler — the copied passage
    // starts at position 3, OFF the 16-token grid by 3
    val passage = (0 until 16).map(i => s"dup$i")
    val doc0 = (passage ++ (16 until 64).map(i => s"a$i")).mkString(" ")
    val doc1 = ((0 until 3).map(i => s"b$i") ++ passage ++
      (0 until 45).map(i => s"c$i")).mkString(" ")
    val docs = spark.createDataFrame(Seq((0L, doc0), (1L, doc1)))
      .toDF("doc_id", "text")

    // the aligned operator is blind to it: doc 1 loses nothing
    val aligned = Scoring.exciseSpans(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(aligned(1).getLong(2) == 0L,
      "aligned grid must miss the offset-3 duplicate (the documented gap)")

    // the shift-invariant operator excises exactly the 16 copied tokens
    // as ONE maximal interval, rebuilding doc 1 without the passage
    val shifted = Scoring.exciseSpansShift(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(shifted(0).getLong(2) == 0L, "first occurrence must be kept")
    assert(shifted(0).getString(5) == doc0)
    assert(shifted(1).getLong(2) == 16L, "exactly the copied span is cut")
    assert(shifted(1).getLong(3) == 1L, "one maximal interval")
    assert(shifted(1).getLong(4) == 64L - 16L)
    val expect1 = ((0 until 3).map(i => s"b$i") ++
      (0 until 45).map(i => s"c$i")).mkString(" ")
    assert(shifted(1).getString(5) == expect1)
  }

  test("shift-invariant excision: overlapping repeats union into maximal intervals") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    // doc 1 copies a 20-token passage of doc 0 (positions 5..24): five
    // stride-1 spans of 16 are duplicated, overlapping — the union must be
    // one 20-token interval, not 5x16 marks
    val passage = (0 until 20).map(i => s"p$i")
    val doc0 = ((0 until 5).map(i => s"x$i") ++ passage ++
      (0 until 20).map(i => s"y$i")).mkString(" ")
    val doc1 = ((0 until 7).map(i => s"z$i") ++ passage ++
      (0 until 18).map(i => s"w$i")).mkString(" ")
    val docs = spark.createDataFrame(Seq((0L, doc0), (1L, doc1)))
      .toDF("doc_id", "text")
    val r = Scoring.exciseSpansShift(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(1).getLong(2) == 20L, "union of overlapping marks = the passage")
    assert(r(1).getLong(3) == 1L, "resolved to ONE maximal interval")
    val expect1 = ((0 until 7).map(i => s"z$i") ++
      (0 until 18).map(i => s"w$i")).mkString(" ")
    assert(r(1).getString(5) == expect1)
  }
}
