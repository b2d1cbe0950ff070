package graft

import graft.operators.EventLifecycle
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Batch sessionization + SCD2: semantic spot checks on the harness events
  * plus the single-exchange plan lock the operators are designed around
  * (windows and final aggregation all run inside one user_id hash
  * partitioning — see EventLifecycle's scaladoc). */
class EventLifecycleSpec extends SparkSpec {

  private def run(name: String): DataFrame =
    EventLifecycle.all(name).fn(spark, sf0)

  private def exchanges(df: DataFrame): Int = {
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // count hash shuffles only; the final orderBy's range partitioning
    // is presentation, not operator cost
    "Arguments: hashpartitioning".r.findAllIn(plan).size
  }

  test("sessionize: sessions partition each user's events; bounds nested") {
    val df = run("q_sessionize").cache()
    try {
      val total = df.agg(org.apache.spark.sql.functions.sum("n_events"))
        .head.getLong(0)
      val nEvents = graft.core.Tables.events(spark, sf0).count()
      assert(total === nEvents, "sessions must partition the event log")
      // sessions are disjoint, ordered intervals per user
      val rows = df.orderBy("user_id", "session_id")
        .collect().groupBy(_.getLong(0))
      rows.values.foreach { sess =>
        sess.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getLong(3) <= a.getLong(4), "start <= end")
            // next session starts strictly after the previous ends + gap
            assert(b.getLong(3) - a.getLong(4) > EventLifecycle.sessionGapUs,
              "inter-session gap must exceed the idle threshold")
          case _ => ()
        }
      }
    } finally df.unpersist()
  }

  test("scd2: versions chain per user (valid_to = next valid_from; one current)") {
    val df = run("q_scd2")
    val byUser = df.orderBy("user_id", "version").collect().groupBy(_.getLong(0))
    byUser.values.foreach { vers =>
      // exactly one open (current) version per user, and it is the last
      assert(vers.count(_.getBoolean(6)) === 1)
      assert(vers.last.getBoolean(6))
      vers.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) >= 1)
          assert(!a.getBoolean(6), "only the last version is current")
          assert(a.getLong(4) === b.getLong(3),
            "valid_to must equal the next version's valid_from")
          assert(a.getString(2) !== b.getString(2),
            "consecutive versions must differ in event_type")
        case _ => ()
      }
    }
  }

  test("plan: both lifecycle ops shuffle exactly once (user_id hash)") {
    assert(exchanges(run("q_sessionize")) === 1)
    assert(exchanges(run("q_scd2")) === 1)
  }

  test("analytics trio: funnel monotone, retention triangular, cume-distinct consistent") {
    val funnel = run("q_funnel").collect()
    assert(funnel.length === 3)
    val ns = funnel.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), "funnel stages can only lose users")

    val ret = run("q_retention").collect()
    val cohorts = ret.map(_.getLong(0)).distinct
    cohorts.foreach { c =>
      val rows = ret.filter(_.getLong(0) == c)
      // offset 0 is the cohort itself and is its maximum activity row
      val off0 = rows.find(_.getLong(1) == 0L).get.getLong(2)
      assert(rows.forall(_.getLong(2) <= off0))
      assert(rows.forall(_.getLong(1) >= 0L))
    }

    val cume = run("q_window_cume_distinct").collect()
    val byType = cume.groupBy(_.getString(0))
    val users = graft.core.Tables.events(spark, sf0)
      .select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.length.toLong }
    byType.foreach { case (t, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // running total is the prefix sum of n_new and ends at the true
      // distinct-user count
      var acc = 0L
      sorted.foreach { r => acc += r.getLong(2); assert(r.getLong(3) === acc) }
      assert(acc === users(t))
    }
  }
}
