package graft

import graft.operators.{AdvancedQueries, Curation, PipelineQueries, QualityChecks, Sampling}
import org.apache.spark.sql.functions._

/** Unit/property coverage for the round-13 additions beyond the TPC-H
  * shapes: boilerplate removal, weighted sampling, OOV rate, Zipf fit,
  * quantile binning, k-anonymity, blocked entity matching. Values at
  * sf0.01 are pinned by the DuckDB oracle (driver t2); these specs pin
  * the SEMANTIC contracts on small frames. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("weightedSample: bottom-k by hash/weight, deterministic, k-bounded") {
    val df = (1 to 200).map(i => (i.toLong, (i % 5 + 1).toLong)).toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", 20).collect()
    val s2 = Sampling.weightedSample(df, "id", "w", 20).collect()
    assert(s1.length == 20)
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq,
      "selection must be retry-deterministic")
  }

  test("weightedSample: heavier rows win more often than lighter ones") {
    // two weight classes; with w=10 vs w=1 the heavy class should
    // dominate the sample (priority = hash/w shrinks 10x)
    val df = (1 to 400).map(i =>
      (i.toLong, if (i <= 200) 10L else 1L)).toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", 50)
      .collect().map(_.getLong(0))
    val heavy = picked.count(_ <= 200)
    assert(heavy > 35, s"heavy class picked only $heavy/50 — weighting inert?")
  }

  test("q_boilerplate removes only spans covered by df>=3 grams") {
    val out = Curation.all("q_boilerplate").fn(spark, sf0)
      .select("doc_id", "n_toks", "n_removed").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, rem) = (r.getLong(1), r.getLong(2))
      assert(rem >= 0 && rem <= n, s"doc ${r.getLong(0)}: removed $rem of $n")
    }
    // frequency-based removal must touch SOMETHING on harness data
    assert(out.map(_.getLong(2)).sum > 0, "no boilerplate found at all")
  }

  test("q_oov_rate: rate is n_oov/n_toks in [0,1]") {
    val rows = Curation.all.get("q_oov_rate")
      .orElse(PipelineQueries.all.get("q_oov_rate")).get
      .fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate == r.getAs[Long]("n_oov").toDouble / r.getAs[Long]("n_toks"))
    }
  }

  test("q_zipf: slope is finite and non-positive on harness text") {
    val r = PipelineQueries.all("q_zipf").fn(spark, sf0).collect().head
    val slope = r.getAs[Double]("zipf_slope")
    assert(!slope.isNaN && !slope.isInfinite)
    assert(slope <= 0.0, s"rank-frequency slope must fall, got $slope")
  }

  test("q_bin_quantile: bins partition every row, boundaries ordered") {
    val rows = AdvancedQueries.all("q_bin_quantile").fn(spark, sf0).collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq.sorted == (1 to rows.length))
    val total = rows.map(_.getAs[Long]("n")).sum
    val liCount = graft.core.Tables.lineitem(spark, sf0).count()
    assert(total == liCount, s"bins lost rows: $total vs $liCount")
    // bin boundaries must be monotone: hi(bin) <= lo(bin+1)
    rows.sortBy(_.getAs[Int]("bin")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
      case _ =>
    }
  }

  test("q_k_anonymity: every group size counted, flag matches k=5") {
    val rows = QualityChecks.all("q_k_anonymity").fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("meets_k") == (r.getAs[Long]("n") >= 5))
    }
  }

  test("intervalOverlap: equals the naive overlap join, each pair once") {
    val rnd = new scala.util.Random(7)
    val a = (1 to 120).map(i =>
      (i.toLong, rnd.nextInt(400).toLong))
      .map { case (k, s) => (k, s, s + rnd.nextInt(60)) }
      .toDF("a_key", "a_s", "a_e")
    val b = (1 to 120).map(i =>
      (i.toLong + 1000, rnd.nextInt(400).toLong))
      .map { case (k, s) => (k, s, s + rnd.nextInt(60)) }
      .toDF("b_key", "b_s", "b_e")
    val got = graft.operators.RangeJoin
      .intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 16)
      .select("a_key", "b_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = a.crossJoin(b)
      .where($"a_s" <= $"b_e" && $"b_s" <= $"a_e")
      .select("a_key", "b_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.size == got.distinct.size, "a pair was emitted twice")
    assert(got.sorted == want.sorted,
      s"binned overlap != naive: ${got.size} vs ${want.size} pairs")
  }

  test("q_event_dedup_window: kept <= events; first event always kept") {
    val rows = graft.operators.EventLifecycle.all("q_event_dedup_window")
      .fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_kept"))
      assert(k >= 1 && k <= n, s"kept $k of $n")
    }
  }

  test("q_embed_centroid: |labels| x dim rows; centroid inside value range") {
    val rows = PipelineQueries.all("q_embed_centroid").fn(spark, sf0).collect()
    val labels = rows.map(_.getAs[Int]("label")).distinct
    assert(rows.length == labels.length * 64)
    rows.foreach { r =>
      val c = r.getAs[Double]("centroid")
      assert(!c.isNaN && math.abs(c) < 1e6)
    }
  }

  test("triangle orientation: degree-ordered wedge count on a known graph") {
    // graph: square 1-2-3-4-1 plus diagonal 1-3 => exactly 2 triangles
    // (1,2,3) and (1,3,4); a hub node 5 connected to 1..4 adds 5 more:
    // (1,2,5),(2,3,5),(3,4,5),(1,4,5),(1,3,5)
    val und = Seq((1, 2), (2, 3), (3, 4), (1, 4), (1, 3),
      (5, 1), (5, 2), (5, 3), (5, 4)).toDF("u0", "v0")
      .select(least($"u0", $"v0").as("u"), greatest($"u0", $"v0").as("v"))
    val deg = und.select($"u".as("node")).union(und.select($"v".as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val wd = und
      .join(deg.select($"node".as("u"), $"deg".as("du")), "u")
      .join(deg.select($"node".as("v"), $"deg".as("dv")), "v")
    val oriented = wd.select(
      when(struct($"du", $"u") < struct($"dv", $"v"),
        struct($"u".as("a"), $"v".as("b")))
        .otherwise(struct($"v".as("a"), $"u".as("b"))).as("e"))
      .select($"e.a".as("a"), $"e.b".as("b"))
    val wedges = oriented.as("x").join(oriented.as("y"),
        $"x.a" === $"y.a" && $"x.b" < $"y.b")
      .select($"x.b".as("w1"), $"y.b".as("w2"))
    val n = wedges.join(oriented,
      ($"a" === $"w1" && $"b" === $"w2") ||
        ($"a" === $"w2" && $"b" === $"w1"), "left_semi").count()
    assert(n == 7, s"expected 7 triangles, got $n")
  }

  test("q_vocab_prune: df bounds hold for every surviving term") {
    val docs = graft.core.Tables.documents(spark, sf0)
    val nDocs = docs.count()
    val rows = PipelineQueries.all("q_vocab_prune").fn(spark, sf0).collect()
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      assert(df >= 2 && df <= nDocs / 2, s"term ${r.getString(0)} df=$df")
      assert(r.getAs[Long]("tf") >= df)
    }
  }

  test("q_skew_audit: shares in (0,1], salts >= 1, top-10 only") {
    val rows = AdvancedQueries.all("q_skew_audit").fn(spark, sf0).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Long]("salts") >= 1L)
    }
  }

  test("q_entity_match: a planted near-duplicate pair is found via its block") {
    // direct operator check on a tiny frame: same block, distance 1
    val c = Seq((1L, "Customer#000000001", 7L), (2L, "Customer#000000002", 7L),
      (3L, "Totally#Different", 7L), (4L, "Customer#000000001", 9L))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val pairs = c.as("a").join(c.as("b"),
        $"a.c_nationkey" === $"b.c_nationkey" && $"a.c_custkey" < $"b.c_custkey")
      .where(levenshtein($"a.c_name", $"b.c_name") <= 1)
      .select($"a.c_custkey", $"b.c_custkey").collect()
    assert(pairs.length == 1 && pairs.head.getLong(0) == 1L
      && pairs.head.getLong(1) == 2L)
  }
}
