package graft

import graft.core.Tables
import graft.operators.TimeSeries
import java.time.LocalDate
import org.apache.spark.sql.execution.ExplainMode

/** Regular-grid resampling: grid completeness, the two fill semantics,
  * and the one-events-shuffle plan contract. */
class TimeSeriesSpec extends SparkSpec {

  private lazy val interp = TimeSeries.all("q_ts_resample").fn(spark, sf0).collect()
  private lazy val ffill = TimeSeries.all("q_ts_ffill").fn(spark, sf0).collect()

  test("grid: per user, days are contiguous and unique from first to last") {
    assert(interp.nonEmpty)
    interp.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val days = rows.map(r => LocalDate.parse(r.getString(1))).sortBy(_.toEpochDay)
      assert(days.distinct.length === days.length, "no duplicate grid days")
      assert(days.last.toEpochDay - days.head.toEpochDay === days.length - 1,
        "no holes between first and last observed day")
    }
  }

  test("observed days keep the exact rollup value in both fills") {
    val obs = TimeSeries.dailyObserved(Tables.events(spark, sf0))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    for (rows <- Seq(interp, ffill); r <- rows if !r.getBoolean(3)) {
      assert(r.getDouble(2) === obs((r.getLong(0), r.getString(1))),
        "an observed day must pass through untouched")
    }
    // every key marked filled really is absent from the rollup
    for (r <- interp if r.getBoolean(3))
      assert(!obs.contains((r.getLong(0), r.getString(1))))
  }

  test("interpolated values are convex combinations; ffill carries the left neighbor") {
    val byUser = interp.groupBy(_.getLong(0))
    val fByKey = ffill.map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    var gaps = 0
    byUser.foreach { case (uid, rows) =>
      val seq = rows.sortBy(_.getString(1))
      var lastObserved = Double.NaN
      seq.foreach { r =>
        if (!r.getBoolean(3)) lastObserved = r.getDouble(2)
        else {
          gaps += 1
          // linear fill sits strictly between (or at) its two anchors
          val idx = seq.indexOf(r)
          val next = seq.drop(idx).find(!_.getBoolean(3)).get.getDouble(2)
          val lo = math.min(lastObserved, next)
          val hi = math.max(lastObserved, next)
          assert(r.getDouble(2) >= lo - 1e-9 && r.getDouble(2) <= hi + 1e-9,
            s"user $uid day ${r.getString(1)}: ${r.getDouble(2)} outside [$lo, $hi]")
          // LOCF twin carries the left anchor exactly
          assert(fByKey((uid, r.getString(1))) === lastObserved)
        }
      }
    }
    assert(gaps > 0, "harness data must actually exercise gap fill")
  }

  test("ewma: matches the sequential recurrence replayed in memory") {
    val obs = TimeSeries.dailyObserved(Tables.events(spark, sf0)).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
    val expect = obs.groupBy(_._1).iterator.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(_._2)
      var e = ordered.head._3
      ordered.zipWithIndex.map { case ((_, day, v), i) =>
        if (i > 0) e = 0.5 * v + 0.5 * e
        (uid, day) -> e
      }
    }.toMap
    val got = TimeSeries.ewmaDaily(Tables.events(spark, sf0)).collect()
    assert(got.length === obs.length)
    got.foreach { r =>
      assert(r.getDouble(3) === expect((r.getLong(0), r.getString(1))),
        s"ewma recurrence diverged at user ${r.getLong(0)} day ${r.getString(1)}")
    }
  }

  test("plan: events aggregate map-side partial; fills run on the rollup") {
    val p = TimeSeries.resampleDaily(Tables.events(spark, sf0), interpolate = true)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("partial_sum") || p.contains("partial"),
      s"daily rollup must combine map-side before its exchange:\n$p")
    // the grid explode and neighbor windows must NOT re-touch the raw
    // events relation: exactly one scan of the events source per branch
    // pair (rollup + bounds), never one per window
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).length
    assert(scans <= 2, s"fills must run on the rollup, not rescan events ($scans scans):\n$p")
  }
}
