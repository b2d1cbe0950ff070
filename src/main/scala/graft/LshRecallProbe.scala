package graft

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures LSH pair recall at the ADAPTIVE operating point (VERDICT r8
  * #5): the two registered recall rows pin 12-bit×8 and 10-bit×16 widths
  * on the ~2 k-vector sf corpus, but at the 64× ladder rung
  * `adaptiveBits(128 k) = 18`, where per-pair recall at a fixed angle is
  * far lower — the tables dial has to compensate, and that compensation
  * should be a MEASURED point, not only a formula.
  *
  * Method: same planted-twin construction as the oracle rows
  * (`PipelineQueries.plantedTwinCorpus` — md5-signed ±50% multiplicative
  * per-dim perturbation landing pairs at cos ≈ 0.89), scaled to K twins
  * planted on the ladder corpus with a +1e9 id offset (ladder replica ids
  * reach ~6.3e8). Denominator: planted pairs whose exact cos ≥ tau
  * (direct orig⋈twin join — O(K), no all-pairs). Numerator: of those, the
  * pairs `lshCosinePairsAuto` emits. Also prints the analytic per-pair
  * recall at the measured mean angle and the tables count the formula
  * says would restore ≥0.97 — so the measured and predicted dial positions
  * can be compared in SCALE.md.
  *
  * Usage: `runMain graft.LshRecallProbe [ladderDir] [K] [tables ...]`
  */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/ladder/x64")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(512)
    val tablesList: Seq[Int] = {
      val t = args.drop(2).map(_.toInt).toSeq
      if (t.nonEmpty) t else Seq(8)
    }
    val tau = 0.8
    val offset = 1000000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // planted twins: md5-signed +-50% per-dim perturbation of the first K
    // base vectors (same construction as the oracle recall rows; the sgn
    // key sees the ORIGINAL vec_id, hence the two-step select)
    def sgn(i: org.apache.spark.sql.Column) =
      when(conv(substring(md5(concat(lit("plant_"), col("vec_id").cast("string"),
        lit("_"), i.cast("string"))), 1, 1), 16, 10).cast("long") % 2 === 1, lit(1.0))
        .otherwise(lit(-1.0))
    val planted = emb.where(col("vec_id") < k)
      .select(col("vec_id"),
        transform(sequence(lit(0), size(col("embedding")) - 1), i =>
          (element_at(col("embedding"), i + 1).cast("double") *
            (lit(1.0) + lit(0.5) * sgn(i))).cast("float")).as("embedding"))
      .select((col("vec_id") + lit(offset)).as("vec_id"), col("embedding"))
    val u = emb.unionByName(planted).persist()
    val n = u.count()
    val bits = Similarity.adaptiveBits(n)
    println(s"[probe] corpus n=$n adaptiveBits=$bits K=$k tau=$tau")

    // exact per-pair cosine, orig |><| twin — the contract denominator
    val exactPairs = emb.where(col("vec_id") < k)
      .select(col("vec_id").as("orig"), col("embedding").as("ov"))
      .join(planted.select((col("vec_id") - offset).as("orig"), col("embedding").as("tv")), "orig")
      .select(col("orig"), (col("orig") + offset).as("twin"),
        cosineSim(col("ov"), col("tv")).as("cos"))
      .where(col("cos") >= tau)
      .persist()
    val denom = exactPairs.count()
    val meanCos = exactPairs.agg(avg("cos")).head().getDouble(0)
    val p1 = math.pow(1.0 - math.acos(math.min(1.0, meanCos)) / math.Pi, bits)
    val tFor97 = math.ceil(math.log(0.03) / math.log(1.0 - p1)).toInt
    println(f"[probe] qualifying planted pairs=$denom meanCos=$meanCos%.4f " +
      f"analytic p(bits=$bits)=$p1%.4f tablesFor0.97=$tFor97")

    for (tables <- tablesList) {
      val t0 = System.nanoTime()
      val lsh = Similarity.lshCosinePairs(u, "vec_id", "embedding", tau, bits, tables)
        .select(col("va").as("orig"), col("vb").as("twin"))
      val found = lsh.join(exactPairs, Seq("orig", "twin")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val analytic = 1.0 - math.pow(1.0 - p1, tables)
      println(f"[probe] bits=$bits tables=$tables measured_recall=${found.toDouble / denom}%.4f " +
        f"($found/$denom) analytic=${analytic}%.4f wall=${secs}%.1f s")
    }
    spark.stop()
  }
}
