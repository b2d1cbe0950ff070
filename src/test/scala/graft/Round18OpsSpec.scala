package graft

import org.apache.spark.sql.functions._

/** Round-18 regression fixtures (VERDICT r17 #3): the q_event_paths
  * per-user path cap (`pathCap = 256`, EventLifecycle) cannot fire on
  * harness data (max 99 events/user), so until now the cap branch —
  * Spark's `when(rn <= cap)` inside collect_list vs the oracle's
  * `FILTER (WHERE rn <= 256)` — was asserted, not tested. This spec
  * builds a synthetic events table with a 300-event user and checks the
  * registry query truncates EXACTLY as the oracle semantics demand:
  * path = initials of the first 256 events in (ts, event_id) order,
  * n_events stays the UNCAPPED count, and `converted` is evaluated on
  * the truncated path (the fixture's only 'p' sits past the cap, so a
  * leak of uncapped state would flip the flag). */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  test("q_event_paths: >256-event user truncates path, keeps uncapped n_events") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r18_paths_").toString
    // user 1: rn1=view, rn2=click, rn3..299=scroll, rn300=purchase.
    // Uncapped the path matches v.*c.*p (converted=true); capped at 256 the
    // purchase falls off, so the REGISTRY answer must be converted=false.
    val hot = (1 to 300).map { i =>
      val et = i match {
        case 1 => "view"; case 2 => "click"; case 300 => "purchase"
        case _ => "scroll"
      }
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        1L, et, 1.0, "{}")
    }
    // user 2: untouched by the cap — sanity that capping is per-user
    val cold = Seq(
      (1001L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 2L, "view", 1.0, "{}"),
      (1002L, java.sql.Timestamp.valueOf("2024-01-01 01:00:01"), 2L, "click", 1.0, "{}"),
      (1003L, java.sql.Timestamp.valueOf("2024-01-01 01:00:02"), 2L, "purchase", 1.0, "{}"))
    (hot ++ cold)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q_event_paths")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
      .sortBy(_._1)
    val expectedHotPath = "vc" + "s" * 254 // first 256 of 300, initials in rn order
    assert(out.length == 2)
    assert(out(0) == ((1L, 300L, expectedHotPath, false)),
      s"hot user mismatch: n=${out(0)._2} len=${out(0)._3.length} conv=${out(0)._4}")
    assert(out(1) == ((2L, 3L, "vcp", true)))
  }
}
