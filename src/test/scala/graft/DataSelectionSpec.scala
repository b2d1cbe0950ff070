package graft

import graft.operators.DataSelection
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** DSIR importance weighting + Gumbel-top-k resampling: semantic checks
  * (smoothed-model λ table, deterministic selection, target exclusion)
  * plus the plan shapes the operator is designed around — scoring is a
  * zero-shuffle scan with λ inlined as a literal, selection is
  * TakeOrdered, never a global sort. */
class DataSelectionSpec extends SparkSpec {

  private def run(name: String): DataFrame =
    DataSelection.all(name).fn(spark, sf0)

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("fitted lambda table: B finite entries, non-degenerate") {
    val lam = DataSelection.fitLambdas(
      graft.core.Tables.documents(spark, sf0), "text",
      org.apache.spark.sql.functions.col("source")
        .isin(DataSelection.targetSources: _*))
    assert(lam.length === DataSelection.B)
    assert(lam.forall(v => !v.isNaN && !v.isInfinite))
    assert(lam.exists(_ != 0.0), "at least one bucket must discriminate")
  }

  test("weights: raw corpus only; empty docs score 0; logw is a finite fold") {
    val rows = run("q_dsir_weights").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nFeats, logw) = (r.getLong(1), r.getDouble(2))
      assert(nFeats >= 0L)
      if (nFeats == 0L) assert(logw === 0.0, "no features → zero weight")
      assert(!logw.isNaN && !logw.isInfinite)
    }
    val srcs = graft.core.Tables.documents(spark, sf0)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      assert(!DataSelection.targetSources.contains(srcs(r.getLong(0))),
        "target-corpus docs must never be scored")
    }
  }

  test("weights plan: lambda is a plan literal folded per row — zero hash shuffles") {
    val p = plan(DataSelection.importanceWeights(spark, sf0))
    assert(!p.contains("Arguments: hashpartitioning"),
      s"scoring is a pure scan; no shuffle allowed:\n$p")
    assert(!p.contains("Join"), s"lambda must inline, not join:\n$p")
  }

  test("resample: exactly k rows, descending skey, deterministic across runs") {
    val a = run("q_dsir_sample").collect()
    assert(a.length === 100)
    val keys = a.map(_.getDouble(1))
    assert(keys.sameElements(keys.sortBy(-_)), "descending by Gumbel key")
    val b = run("q_dsir_sample").collect()
    assert(a.map(_.getLong(0)).sameElements(b.map(_.getLong(0))),
      "hash-derived Gumbel noise → identical selection on re-run")
  }

  test("resample plan: TakeOrdered top-k, never a global sort exchange") {
    val p = plan(DataSelection.resample(spark, sf0, 100))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition heaps + driver merge:\n$p")
    assert(!p.contains("Arguments: rangepartitioning"),
      s"no global sort for a k-row result:\n$p")
  }

  test("split: disjoint, exhaustive, near-rate, deterministic, shuffle-free") {
    val docs = graft.core.Tables.documents(spark, sf0)
    val a = DataSelection.splitAssign(docs, "doc_id", 0.8, 0.1)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(a.length === docs.count())
    assert(a.map(_._1).distinct.length === a.length, "every doc exactly once")
    val shares = a.groupBy(_._2).view.mapValues(_.length.toDouble / a.length).toMap
    assert(math.abs(shares("train") - 0.8) < 0.1)
    assert(math.abs(shares("valid") - 0.1) < 0.06)
    assert(math.abs(shares("test") - 0.1) < 0.06)
    // salt-keyed hash ⇒ identical assignment on re-run
    val b = DataSelection.splitAssign(docs, "doc_id", 0.8, 0.1)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
    // a pure scan projection: no exchange anywhere
    val p = plan(DataSelection.splitAssign(docs, "doc_id", 0.8, 0.1))
    assert(!p.contains("Exchange"), s"split assignment must not shuffle:\n$p")
  }

  test("resample favors high-weight docs vs uniform sampling") {
    // The mean logw of the selected set must beat the raw-corpus mean:
    // if importance weighting did nothing, Gumbel-top-k degenerates to
    // a uniform sample and this gap collapses to ~0.
    val w = run("q_dsir_weights").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val all = w.values.toArray
    val selected = run("q_dsir_sample").collect().map(r => w(r.getLong(0)))
    assert(selected.sum / selected.length > all.sum / all.length,
      "selected docs must skew toward the target distribution")
  }
}
