package graft

import graft.core.Tables
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions.cosineSim
import graft.operators.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the shuffle-byte reduction of the id-only LSH candidate shape
  * (SCALE.md round 11): the r10 shape carried both full embedding vectors
  * through the candidate self-join AND the cross-table dedup distinct; the
  * current shape moves only (vec_id, tbl, bucket) / (va, vb) and re-joins
  * vectors for the surviving unique pairs. Reconstructs the legacy shape
  * inline (the library no longer exposes it) and runs both over the same
  * corpus, summing executor shuffle-write bytes/records via a listener.
  *
  * Usage: `runMain graft.LshShuffleProbe [sfDir]` (pairs with the x-rung
  * ladder dirs from `ScaleLadder` for at-scale points).
  */
object LshShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val bytes = new java.util.concurrent.atomic.AtomicLong
    val recs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })

    // Listener bus is async: poll until the counters sit still — but
    // BOUNDED (~30 s): unrelated task activity on the shared bus (or a
    // straggling stage) could otherwise keep the counters moving and hang
    // the probe instead of reporting (ADVICE r11). On timeout, emit the
    // last-seen counters with a not-settled warning; the measurement is
    // then an upper bound, which still answers the ratio question.
    def settled(): (Long, Long) = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var prev = (-1L, -1L)
      var cur = (bytes.get, recs.get)
      while (cur != prev && System.nanoTime() < deadline) {
        Thread.sleep(500)
        prev = cur
        cur = (bytes.get, recs.get)
      }
      if (cur != prev)
        System.err.println(
          s"[lsh-shuffle] WARN counters not settled after 30 s: bytes=${cur._1} recs=${cur._2}")
      cur
    }

    def measure(tag: String, df: => DataFrame): (Long, Long, Long, Double) = {
      settled()
      bytes.set(0); recs.set(0)
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val (b, r) = settled()
      System.err.println(f"[lsh-shuffle] $tag%-8s pairs=$n%8d shuffleMB=${b / 1e6}%10.2f recs=$r%12d sec=$sec%7.2f")
      (n, b, r, sec)
    }

    val emb = Tables.embeddings(spark, sfDir)
    val tau = 0.8
    val bits = 12
    val tables = 8

    /** r10 shape: vectors ride the bucket rows through the join + distinct. */
    def legacy(): DataFrame = {
      val e = emb.select(col("vec_id"), col("embedding").as("v"))
      val bucketed = e.select(col("vec_id"), col("v"),
        posexplode(transform(sequence(lit(0), lit(tables - 1)),
          t => call_function("graft_hyperplane_bucket_md5", col("v"), t, lit(bits)))))
        .toDF("vec_id", "v", "tbl", "bucket")
      bucketed.as("a")
        .join(bucketed.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
          col("a.v").as("va_v"), col("b.v").as("vb_v"))
        .distinct()
        .select(col("va"), col("vb"), cosineSim(col("va_v"), col("vb_v")).as("cos"))
        .where(col("cos") >= tau)
    }

    // warm both paths once (JIT/codegen), then measure
    legacy().count()
    Similarity.lshCosinePairs(emb, "vec_id", "embedding", tau, bits, tables).count()

    val (nL, bL, rL, sL) = measure("legacy", legacy())
    val (nN, bN, rN, sN) = measure("id-only",
      Similarity.lshCosinePairs(emb, "vec_id", "embedding", tau, bits, tables))
    require(nL == nN, s"pair counts diverge: legacy=$nL id-only=$nN")
    println(s"""{"probe":"lsh_shuffle","sf_dir":"$sfDir","bits":$bits,"tables":$tables,""" +
      s""""pairs":$nN,"legacy_bytes":$bL,"idonly_bytes":$bN,""" +
      s""""legacy_recs":$rL,"idonly_recs":$rN,""" +
      s""""bytes_ratio":${if (bN == 0) 0 else bL.toDouble / bN},""" +
      s""""legacy_sec":$sL,"idonly_sec":$sN}""")
    spark.stop()
  }
}
