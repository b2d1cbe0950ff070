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
}
