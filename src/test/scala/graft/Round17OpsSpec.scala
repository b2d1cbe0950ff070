package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Round-17 shape and bound locks: the weighted-median two-phase window,
  * the event-path aggregation-state cap, and the skyline empty-input
  * guard. */
class Round17OpsSpec extends SparkSpec {

  test("plan lock: weighted-median per-value cumulative window partitions " +
      "by (flag, bucket) — never by the 3 return flags alone") {
    import org.apache.spark.sql.execution.window.WindowExec
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_weighted_median")(spark, sf0)
        .queryExecution.executedPlan
      // the phase-2 cumulative is the only window ORDERED BY cents; its
      // partition spec must carry the bucket id, so its parallelism is
      // flags × buckets, not |flags| = 3 (the r16 residual this replaces)
      val cum = plan.collect { case w: WindowExec
        if w.orderSpec.exists(_.child.toString.contains("cents")) => w }
      assert(cum.nonEmpty, s"no cents-ordered window found:\n$plan")
      cum.foreach { w =>
        assert(w.partitionSpec.exists(_.toString.contains("pid")),
          s"cents-ordered window not bucketed:\n$w")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("q_event_paths: a user past the 256-event cap gets a capped path " +
      "whose content is the first 256 events, with the uncapped count") {
    import spark.implicits._
    // synthetic events dir: one user, 300 events, types cycling v/c/p so
    // the capped prefix is deterministic and conversion still holds
    val tmp = java.nio.file.Files.createTempDirectory("graft_cap").toString
    val types = Array("view", "click", "purchase", "scroll", "exit")
    val rows = (1 to 300).map { i =>
      (7L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i / 60}%02d.${(i % 60) * 1000 + i}%06d"),
        i.toLong, types(i % 5))
    }
    rows.toDF("user_id", "ts", "event_id", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("q_event_paths")(spark, tmp).collect()
    assert(out.length === 1)
    val (n, path) = (out(0).getLong(1), out(0).getString(2))
    assert(n === 300L, "n_events must stay the uncapped count")
    assert(path.length === 256, s"path must cap at 256, got ${path.length}")
    // first 256 events in (ts, event_id) order: event i contributes
    // types(i % 5).head — verify the prefix content, not just the length
    val expected = (1 to 256).map(i => types(i % 5).head).mkString
    assert(path === expected)
  }

  test("q_skyline: empty part input yields an empty frame, not an NPE") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sky").toString
    Tables.part(spark, sf0).where(lit(false))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val out = SparkEntry.queries("q_skyline")(spark, tmp)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("p_partkey", "price", "size"))
  }

  test("q_assoc_rules fractional floors: the emitted rule set equals a " +
      "brute-force a-priori replay at the same fractions") {
    val bask = Tables.lineitem(spark, sf0)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbask = bask.map(_._1).distinct.length.toLong
    val minsup = (nbask + 1999) / 2000
    val pairFloor = (nbask + 9999) / 10000
    val supp = bask.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val freq = supp.filter(_._2 >= minsup).keySet
    val byOrder = bask.filter(p => freq(p._2)).groupBy(_._1)
    val pairs = byOrder.values.toSeq.flatMap { rs =>
      val pks = rs.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length) yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= pairFloor).toMap
    val got = SparkEntry.queries("q_assoc_rules")(spark, sf0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === pairs, s"rule sets differ: got ${got.size}, expected ${pairs.size}")
  }

  test("q_assoc_topk: every emitted item is in the deterministic " +
      "(support DESC, key) top-1000, and pair counts replay brute-force") {
    val bask = Tables.lineitem(spark, sf0)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val topk = bask.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (pk, n) => (-n, pk) }.take(1000).toMap
    val byOrder = bask.filter(p => topk.contains(p._2)).groupBy(_._1)
    val expect = byOrder.values.toSeq.flatMap { rs =>
      val pks = rs.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length) yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= 2).toMap
    val got = SparkEntry.queries("q_assoc_topk")(spark, sf0).collect()
    got.foreach { r =>
      assert(topk.contains(r.getLong(0)) && topk.contains(r.getLong(1)))
      assert(r.getLong(3) === topk(r.getLong(0)), "n_a must be the item support")
    }
    assert(got.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap === expect)
  }
}
