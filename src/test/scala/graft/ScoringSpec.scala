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
}
