package graft.operators

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Both primitives rank
  * by a salted md5-60 hash of the row's id instead of an RNG:
  *
  *   - reproducible across runs, engines (the SQL oracle replays the exact
  *     hash), task RETRIES and any repartitioning — Spark's own
  *     `df.sample(seed)` draws per-partition, so its output changes when
  *     the partitioning does; at 100 TB with speculative execution that is
  *     a silent non-determinism in the training set;
  *   - uniform over ids (md5 avalanche), salt-switchable for independent
  *     resamples (change the salt, get a fresh sample).
  */
object Sampling {

  /** The 60-bit ranking hash: `md5_60(salt + "_" + id)` — DuckDB twin
    * `('0x' || substr(md5(salt || '_' || id::VARCHAR), 1, 15))::BIGINT`. */
  private[operators] def rankHash(id: Column, salt: String): Column =
    md5Hash60(concat(lit(salt + "_"), id.cast("string")))

  /** Bernoulli-style sample keeping ~`frac` of rows: hash < frac·2^60.
    * ZERO shuffle — a pure codegen'd scan filter, the right 100 TB shape
    * (the filter pushes nothing to parquet, but the scan is one pass and
    * embarrassingly parallel). The threshold is computed ONCE here and
    * inlined, so both engines compare against the identical literal. */
  def sampleFraction(df: DataFrame, idCol: String, frac: Double,
      salt: String = "samp"): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0,1]")
    GraftFunctions.register(df.sparkSession)
    df.where(rankHash(col(idCol), salt) < lit(threshold(frac)))
  }

  /** `floor(frac · 2^60)` as the hash cutoff — exposed so the SQL oracle
    * can inline the same integer literal instead of re-deriving it from
    * doubles (whose rounding is engine-specific). */
  def threshold(frac: Double): Long = (frac * (1L << 60).toDouble).toLong

  /** Weighted sampling WITHOUT replacement (priority / sequential-Poisson
    * sampling, Ohlsson '98): each row draws priority `hash(id)/w` and the
    * k SMALLEST priorities win — rows with larger weight `w` draw smaller
    * priorities proportionally more often. Deterministic (the "random"
    * draw is the salted md5-60 rank), and every arithmetic step is a
    * single IEEE op on exactly-convertible operands (int64→double
    * conversion + one division), so the oracle reproduces the selection
    * bit-for-bit. Scale shape: zero-shuffle priority projection +
    * TakeOrdered top-k (per-partition heaps) — never a global sort. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "wsamp"): DataFrame = {
    require(k > 0, "k must be positive")
    GraftFunctions.register(df.sparkSession)
    df.withColumn("priority",
        rankHash(col(idCol), salt).cast("double") / col(weightCol).cast("double"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** Up to `k` rows per stratum, chosen by hash rank (ties broken by id):
    * a balanced, reproducible per-bucket sample — the "cap every language
    * / source / length-bucket at k docs" curation step. One exchange on
    * the stratum key; the per-stratum WindowExec sort is bounded by the
    * largest stratum (AQE splits skewed partitions), and the output is
    * k·|strata| regardless of input size. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, salt: String = "samp"): DataFrame = {
    require(k > 0, "k must be positive")
    GraftFunctions.register(df.sparkSession)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(rankHash(col(idCol), salt), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
  }
}
