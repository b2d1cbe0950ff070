package graft

import graft.functions.{Scored, TopKAggregator}
import graft.operators.{Dedup, Similarity}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Measured properties of the approximate-similarity operators: LSH
  * precision/recall against the exact tiled join, connected-components
  * path equivalence, and the bounded top-k accumulator's invariants. */
class SimilaritySpec extends SparkSpec {

  test("ivfTopKProbe: recall@10 vs brute is monotone in nprobe; nprobe = |cells| is exact") {
    import graft.operators.KMeansQuant
    val emb = Tables.embeddings(spark, sf0).select("vec_id", "embedding")
    val assigned = KMeansQuant.fit(emb, "vec_id", "embedding", 8, 2).cache()
    val cents = KMeansQuant.centroidsAfter(emb, "vec_id", "embedding", 8, 2)
    val pred = col("vec_id") < 16
    val truth = Similarity.bruteTopK(emb, emb.where(pred), "vec_id", "embedding", 10)
      .select("qid", "vid").cache()
    val denom = truth.count().toDouble
    assert(denom > 0)
    val recalls = Seq(1, 2, 4, 8).map { np =>
      val got = Similarity.ivfTopKProbe(emb, "vec_id", "embedding",
        assigned, cents, pred, 10, np)
      got.join(truth, Seq("qid", "vid")).count().toDouble / denom
    }
    // the recall dial the 100 TB knob claim rides on (VERDICT r15 #8):
    // more probed cells can only ADD candidates, so recall@10 is
    // nondecreasing, and probing every cell degenerates to exact search
    recalls.sliding(2).foreach { w =>
      assert(w(1) >= w(0), s"recall not monotone in nprobe: $recalls")
    }
    assert(recalls.last == 1.0, s"nprobe=|cells| must equal brute: $recalls")
    assigned.unpersist(); truth.unpersist()
  }

  test("hyperplane LSH: precision 1 (verified), recall measured vs exact") {
    val emb = Tables.embeddings(spark, sf0)
    val exact = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.4)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshCosinePairs(emb, "vec_id", "embedding", 0.4)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact verification inside the operator ⇒ precision is exactly 1
    assert(lsh.subsetOf(exact))
    // recall is a parameter property, not a correctness property: at
    // cos≈0.4 (θ≈66°) with 12 bits × 8 tables it is LOW by design — the
    // harness embeddings have no high-similarity structure for LSH to
    // exploit (measured: pairs are continuous through the threshold).
    // The exact path for this regime is the tiled join; LSH earns its
    // keep only when near-duplicate structure exists.
    val recall = if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    info(f"LSH recall at tau=0.4: $recall%.3f (${lsh.size}/${exact.size})")
    // planted EXACT duplicates (identical vectors ⇒ identical buckets in
    // every table) are always found: recall 1 at cos=1 regardless of params
    val dup = emb.limit(3).select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val withDups = emb.select("vec_id", "embedding").union(dup)
    val found = Similarity.lshCosinePairs(withDups, "vec_id", "embedding", 0.99)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = emb.limit(3).select("vec_id").collect().map(_.getLong(0))
      .map(id => (id, id + 100000L)).toSet
    assert(want.subsetOf(found), s"missing planted duplicates: ${want.diff(found)}")
  }

  test("adaptiveBits: integer ceil-log2 with floor/cap, stable at power-of-two boundaries") {
    import Similarity.{adaptiveBits, ceilLog2}
    // bit-length arithmetic, never floating log2: the DuckDB oracle derives
    // the same width via length(bin(greatest(n,2)-1)) and the two must
    // agree at EXACT powers of two where fp log2 rounds one-off
    assert(ceilLog2(2) == 1 && ceilLog2(3) == 2 && ceilLog2(4) == 2)
    assert(ceilLog2(5) == 3 && ceilLog2(2000) == 11)
    assert(ceilLog2(4096) == 12 && ceilLog2(4097) == 13)
    assert(ceilLog2(128000) == 17)
    assert(adaptiveBits(0) == 8 && adaptiveBits(200) == 9)
    // sf0.1 corpus (2k vectors) derives the width r1-r7 registered fixed
    assert(adaptiveBits(2000) == 12)
    assert(adaptiveBits(4096) == 13)            // boundary: 12+1, not 13+1
    assert(adaptiveBits(128000) == 18)          // the 64x ladder rung
    assert(adaptiveBits(Long.MaxValue) == 28)   // int-bucket cap
  }

  test("lshCosinePairsAuto ≡ fixed-width construction at the derived width") {
    val emb = Tables.embeddings(spark, sf0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = pairs(Similarity.lshCosinePairsAuto(emb, "vec_id", "embedding", 0.4))
    val fixed = pairs(Similarity.lshCosinePairs(emb, "vec_id", "embedding", 0.4,
      bits = Similarity.adaptiveBits(emb.count())))
    assert(auto == fixed)
  }

  test("q_ann_lsh_recall: measured LSH recall meets the analytic expectation") {
    // the registered query plants 64 near-dup pairs at cos ≈ 0.88 and
    // reports, per exact pair, whether LSH found it plus the analytic
    // per-pair recall 1-(1-(1-θ/π)^bits)^tables. The planes are fixed
    // (md5-derived), so the measured recall is deterministic; it must sit
    // at (or above) the analytic mean, not catastrophically below —
    // that's the empirical licence for lshCosinePairs as the scale
    // alternative to the exact Θ(n²) pairs.
    val rows = graft.SparkEntry.queries("q_ann_lsh_recall")(spark, sf0).collect()
    assert(rows.length == 64, s"expected the 64 planted pairs, got ${rows.length}")
    val found = rows.count(_.getBoolean(3))
    val recall = found.toDouble / rows.length
    val meanBound = rows.map(_.getDouble(4)).sum / rows.length
    assert(recall >= meanBound - 0.15,
      f"measured recall $recall%.3f far below analytic mean $meanBound%.3f")
    assert(recall > 0.5 && recall < 1.0,
      f"recall $recall%.3f outside the informative range — planted pairs degenerate?")
  }

  test("tablesForRecall: analytic dial — monotone in bits/target, matches hand points") {
    // hand-computed: p(12 bits, cos .9) = 0.8564^12 ≈ 0.1557 → 17.7 → 18;
    // p(10) ≈ 0.2123 → 12.6 → 13; p(18) ≈ 0.0607 → 47.9 → 48 (cos .9,
    // vs 59 at the probe's measured cos .896 — steeper angle, more tables)
    assert(Similarity.tablesForRecall(12, 0.95, 0.9) == 18)
    assert(Similarity.tablesForRecall(10, 0.95, 0.9) == 13)
    assert(Similarity.tablesForRecall(18, 0.95, 0.9) == 48)
    // more bits -> lower per-table hit rate -> more tables
    assert(Similarity.tablesForRecall(18, 0.95, 0.9) > Similarity.tablesForRecall(12, 0.95, 0.9))
    // higher target -> more tables
    assert(Similarity.tablesForRecall(12, 0.99, 0.9) > Similarity.tablesForRecall(12, 0.9, 0.9))
    // cap engages
    assert(Similarity.tablesForRecall(28, 0.999, 0.9, maxTables = 128) == 128)
  }

  test("dupClusters: iterative min-label path ≡ driver union-find path") {
    val pairs = Dedup.minhashPairs(Tables.documents(spark, sf0), "doc_id", "text", 3, 0.8)
    val viaUnionFind = Dedup.dupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIterative = Dedup.dupClusters(pairs, smallGraphMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaUnionFind.nonEmpty && viaIterative == viaUnionFind)
  }

  test("rpTopK: measured recall vs exact top-k; m = corpus degenerates to exact") {
    val emb = Tables.embeddings(spark, sf0)
    val q = emb.where(col("vec_id") < 10)
    def keyed(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keyed(Similarity.bruteTopK(emb, q, "vec_id", "embedding", 5))
    val rp = keyed(Similarity.rpTopK(emb, q, "vec_id", "embedding", r = 16, m = 20, k = 5))
    // recall here is a parameter property, not a correctness property: the
    // harness embeddings are a continuum (no near-duplicate structure), so
    // at r=16 the JL distortion (σ ≈ sqrt((1+cos²)/r) ≈ 0.26) swamps the
    // tiny cosine gap between the 5th and 50th neighbor — the same regime
    // the LSH recall test documents. Measure it; assert only the dials.
    val recall = rp.intersect(exact).size.toDouble / exact.size
    info(f"RP recall at r=16, m=20: $recall%.3f")
    assert(recall > 0.0)
    // deeper rerank pool → candidate supersets → recall can only grow
    val rp40 = keyed(Similarity.rpTopK(emb, q, "vec_id", "embedding", r = 16, m = 40, k = 5))
    assert(rp40.intersect(exact).size >= rp.intersect(exact).size)
    // planted EXACT duplicates survive any projection (projected cosine of
    // identical vectors is exactly 1 ⇒ top of every coarse list): recall 1
    val dup = emb.limit(5).select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val withDups = emb.select("vec_id", "embedding").union(dup)
    val found = keyed(Similarity.rpTopK(withDups, withDups.where(col("vec_id") < 10),
      "vec_id", "embedding", r = 16, m = 20, k = 5))
    val planted = emb.where(col("vec_id") < 5).select("vec_id").collect()
      .map(_.getLong(0)).map(id => (id, id + 100000L)).toSet
    assert(planted.subsetOf(found), s"missing planted duplicates: ${planted.diff(found)}")
    // m = |corpus| reranks everything: exact by construction
    val n = emb.count().toInt
    val all = keyed(Similarity.rpTopK(emb, q, "vec_id", "embedding", r = 16, m = n, k = 5))
    assert(all === exact, "full-pool rerank must equal the exact answer")
  }

  test("rpTopK plan: coarse top-m is a partial aggregation, rerank sides broadcast") {
    val emb = Tables.embeddings(spark, sf0)
    val q = emb.where(col("vec_id") < 10)
    val p = Similarity.rpTopK(emb, q, "vec_id", "embedding", 16, 20, 5)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // map-side bounded heaps: the typed aggregator runs in partial mode
    // before the only corpus-wide exchange
    assert(p.contains("ObjectHashAggregate"), s"typed top-m aggregator expected:\n$p")
    // candidates and queries re-join the corpus via broadcast, never a
    // corpus-wide shuffle join
    assert(p.contains("BroadcastHashJoin"), s"rerank must broadcast the candidate set:\n$p")
  }

  test("TopKAggregator: buffers stay sorted and bounded; merge keeps global best") {
    val agg = new TopKAggregator(3)
    val xs = Seq(0.1, 0.9, 0.5, 0.9, 0.3, 0.7).zipWithIndex
      .map { case (c, i) => Scored(i.toLong, c) }
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    assert(buf.map(_.cos) == List(0.9, 0.9, 0.7))
    assert(buf.map(_.vid) == List(1L, 3L, 5L)) // cos ties break by vid asc
    // merge of two independently-reduced halves equals reduce of the whole
    val (l, r) = xs.splitAt(3)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == buf)
  }
}
