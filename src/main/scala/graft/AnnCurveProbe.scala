package graft

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import graft.operators.{KMeansQuant, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window

/** The ANN recall-vs-cost CURVE at a ladder rung (VERDICT r15 #8): the
  * registered recall rows pin point targets; the 100 TB knob claims in
  * [[graft.operators.Similarity]] (IVF: per-query work ~ nprobe/|cells|;
  * LSH: recall 1-(1-p^bits)^tables vs candidates ~ n·tables/2^bits) should
  * be MEASURED curves, not formulas. For a fixed query sample this probe
  * reports, per operating point, recall@10 against the exact brute-force
  * top-10 and the CANDIDATES SCANNED (the actual cost driver at scale —
  * wall time at sf is floor-dominated):
  *
  *   - IVF at nprobe ∈ {1,2,4,8} over a corpus-sized codebook;
  *   - hyperplane-LSH bucket retrieval across tables × bits around the
  *     adaptive width.
  *
  * Results → SCALE.md "ANN recall-vs-cost curve" rung.
  *
  * Usage: `runMain graft.AnnCurveProbe [ladderDir] [nQueries] [cells]`
  */
object AnnCurveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/ladder/x64")
    val nq = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cells = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).persist()
    val n = emb.count()
    val queries = emb.where(col("vec_id") < nq)
    val k = 10

    // exact ground truth: brute-force top-10 per query
    val truth = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", k)
      .select(col("qid"), col("vid")).persist()
    val denom = truth.count()
    System.err.println(s"[probe] corpus n=$n queries=$nq truth rows=$denom cells=$cells")

    val results = scala.collection.mutable.ArrayBuffer.empty[String]

    // ---- IVF: nprobe dial over a k-means codebook ----
    val assigned = KMeansQuant.fit(emb, "vec_id", "embedding", cells, 2).persist()
    assigned.count()
    val cents = KMeansQuant.centroidsAfter(emb, "vec_id", "embedding", cells, 2)
      .persist()
    val cellSizes = assigned.groupBy("cid").agg(count(lit(1)).as("sz")).persist()
    for (nprobe <- Seq(1, 2, 4, 8)) {
      val t0 = System.nanoTime()
      val got = Similarity.ivfTopKProbe(emb, "vec_id", "embedding",
        assigned, cents, col("vec_id") < nq, k, nprobe)
      val hit = got.join(truth, Seq("qid", "vid")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      // candidates scanned = Σ over queries of probed-cell sizes (replays
      // ivfTopKProbe's probe selection)
      val wp = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cid"))
      val candidates = assigned.where(col("vec_id") < nq)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
        .crossJoin(broadcast(cents))
        .select(col("qid"), col("cid"), KMeansQuant.sqDist(col("qv"), col("cv")).as("cdist"))
        .withColumn("pn", row_number().over(wp)).where(col("pn") <= nprobe)
        .join(cellSizes, "cid").agg(sum("sz")).head().getLong(0)
      val recall = hit.toDouble / denom
      val frac = candidates.toDouble / (n * nq)
      System.err.println(f"[probe] ivf nprobe=$nprobe%-2d recall@10=$recall%.4f candidates=$candidates (${frac * 100}%.1f%% of brute) wall=$secs%.1f s")
      results += f""""ivf_nprobe_$nprobe":{"recall":$recall%.4f,"candidates":$candidates,"scan_frac":$frac%.4f}"""
    }

    // ---- hyperplane LSH: tables × bits around the adaptive width ----
    val bits0 = Similarity.adaptiveBits(n)
    val e = emb.select(col("vec_id"), col("embedding").as("v"))
    val qe = e.where(col("vec_id") < nq)
    // "b:t,b:t,…" as arg 4 overrides; default spans dedup-adaptive widths
    // down to retrieval-coarse ones
    val lshPoints: Seq[(Int, Int)] = args.drop(3).headOption
      .map(_.split(",").toSeq.map { s =>
        val Array(b, t) = s.split(":"); (b.toInt, t.toInt) })
      .getOrElse(Seq((8, 8), (10, 8), (12, 8), (12, 16),
        (bits0, 8), (bits0, 16)))
    for ((bits, tables) <- lshPoints) {
      val t0 = System.nanoTime()
      val corpus = Similarity.signBuckets(e, bits, tables)
      val qb = Similarity.signBuckets(qe, bits, tables)
        .toDF("qid", "tbl", "bucket")
      val cand = qb.join(corpus, Seq("tbl", "bucket"))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("vid")).distinct().persist()
      val candidates = cand.count()
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
      val got = cand
        .join(e.select(col("vec_id").as("vid"), col("v").as("ve")), "vid")
        .join(broadcast(qe.select(col("vec_id").as("qid"), col("v").as("qv"))), "qid")
        .select(col("qid"), col("vid"), cosineSim(col("qv"), col("ve")).as("cos"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      val hit = got.join(truth, Seq("qid", "vid")).count()
      cand.unpersist()
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = hit.toDouble / denom
      val frac = candidates.toDouble / (n * nq)
      System.err.println(f"[probe] lsh bits=$bits%-3d tables=$tables%-3d recall@10=$recall%.4f candidates=$candidates (${frac * 100}%.1f%% of brute) wall=$secs%.1f s")
      results += f""""lsh_b${bits}_t$tables":{"recall":$recall%.4f,"candidates":$candidates,"scan_frac":$frac%.4f}"""
    }
    println(s"""{"metric":"ann_recall_cost_curve","n":$n,"queries":$nq,"k":$k,"cells":$cells,"points":{${results.mkString(",")}}}""")
    spark.stop()
  }
}
