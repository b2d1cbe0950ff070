package graft

import graft.operators.QualityChecks
import org.apache.spark.sql.execution.ExplainMode

/** Constraint suite + anomaly gate: semantic checks on the harness data
  * and the plan shapes (one-pass agg + broadcast anti-join; single
  * user_id shuffle for the anomaly window). */
class QualityChecksSpec extends SparkSpec {

  test("dq checks: five constraints, clean harness data passes the clean ones") {
    val rows = QualityChecks.all("q_dq_checks").fn(spark, sf0).collect()
    assert(rows.length === 5)
    val byName = rows.map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    // harness lineitem has no null quantities and intact RI
    assert(byName("completeness:l_quantity")._2)
    assert(byName("ri:orders_custkey") === ((0.0, true)))
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.0, "metrics are ratios or counts")
    }
  }

  test("dq plan: RI check is a broadcast anti-join") {
    val p = QualityChecks.all("q_dq_checks").fn(spark, sf0).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"),
      s"RI must be a broadcast anti-join:\n$p")
    // the only nested-loop join is the 1-row x 1-row scalar crossJoin of
    // the two aggregate summaries — data-proportional BNLJs stay banned
    // (count tree nodes only; the details section repeats each name)
    val tree = p.split("\n\n")(0)
    assert("BroadcastNestedLoopJoin".r.findAllIn(tree).size <= 1, p)
  }

  test("anomaly: flags exist only with enough window support; math is exact") {
    val rows = QualityChecks.all("q_anomaly").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getBoolean(4)) assert(r.getLong(3) >= 4,
        "anomaly requires >= 4 trailing days of support")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 7, "trailing window is 7 days")
    }
  }

  test("anomaly plan: raw events never shuffle — both exchanges move daily rows") {
    // two hash exchanges is the RIGHT scale shape here: the partial
    // aggregate reduces raw events to per-(user, day) rows BEFORE the
    // first shuffle, and the second exchange re-clusters those daily
    // rows by user for the trailing window. Forcing a single exchange
    // would shuffle the full raw event log by user instead.
    val df = QualityChecks.all("q_anomaly").fn(spark, sf0)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert("Arguments: hashpartitioning".r.findAllIn(p).size === 2, p)
    // partial aggregation happens below (deeper than) the innermost
    // exchange — the tree prints outermost first, so the reduction
    // must appear after the last Exchange line
    val tree = p.substring(0, p.indexOf("(1) Scan"))
    val belowInnermostExchange = tree.substring(tree.lastIndexOf("Exchange"))
    assert(belowInnermostExchange.contains("HashAggregate"),
      s"partial agg must precede the first shuffle:\n$p")
  }

  test("anomaly flag property: int64 rule == exact-rational 2-sigma rule") {
    // the division-free int64 comparison (n*x - sx)^2 > 4*(n*sxx - sx^2)
    // must equal |x - mean| > 2*sigma computed in exact rational
    // arithmetic, for random windows including adversarial near-boundary
    // values — this is the claim that lets the engine skip all float
    // tolerance in the oracle compare
    val rnd = new scala.util.Random(12)
    for (_ <- 1 to 2000) {
      val n = 1 + rnd.nextInt(7)
      val win = Seq.fill(n)(rnd.nextInt(2000001).toLong - 1000000L)
      val x = win(rnd.nextInt(n))
      val sx = win.sum
      val sxx = win.map(c => c * c).sum
      val intFlag = n >= 4 && {
        val d1 = n * x - sx
        d1 * d1 > 4 * (n * sxx - sx * sx)
      }
      // exact rational: mean = sx/n, var = (sxx - sx^2/n)/n, test
      // (x - mean)^2 > 4*var  <=>  (n*x - sx)^2 > 4*(n*sxx - sx^2)
      val bd = BigDecimal
      val mean = bd(sx) / bd(n)
      val variance = (bd(sxx) - bd(sx) * bd(sx) / bd(n)) / bd(n)
      val lhs = (bd(x) - mean).pow(2)
      val exactFlag = n >= 4 && lhs > variance * 4
      assert(intFlag === exactFlag,
        s"flag mismatch on window $win at x=$x: int=$intFlag exact=$exactFlag")
    }
  }

  test("psi drift: terms non-negative; null only when a side is empty") {
    val rows = QualityChecks.all("q_psi_drift").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb) = (r.getLong(1), r.getLong(2))
      assert(na > 0 || nb > 0, "bins come from observed rows only")
      if (r.isNullAt(3)) assert(na == 0 || nb == 0)
      else assert(r.getDouble(3) >= 0.0,
        "(p-q)*ln(p/q) is non-negative by construction")
    }
  }
}
