package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic integer-lattice k-means — the offline coarse-quantizer
  * build an IVF index needs (SURVEY §2.4 similarity family; `ivfTopK`
  * probes a coarse cell, and THIS is how the cells get built without a
  * stand-in). Lloyd iterations, made bit-reproducible on any engine:
  *
  *   - vectors quantize to an integer lattice (`round(x·1000)` per dim, as
  *     double arithmetic) — distances become EXACT integer sums, immune to
  *     float accumulation order;
  *   - init is the k smallest `vec_id`s (deterministic, no RNG);
  *   - assignment ties break by centroid id (window over (dist, cid));
  *   - centroid update is `round(Σx / n)` per dimension — one IEEE double
  *     division of exact integers, identically rounded everywhere.
  *
  * Scale shape per iteration: one broadcast of k centroids (k·dim longs),
  * one window over (vec, k) scored rows partitioned by vec_id, one
  * (cid, dim)-keyed aggregation — no driver-side math at all. A real
  * deployment samples vectors for the codebook build; the fit is the same.
  */
object KMeansQuant {

  /** Integer-lattice view of the vectors: `(vec_id, v: array<long>)`. */
  def quantize(emb: DataFrame, idCol: String, vecCol: String, scale: Int = 1000): DataFrame =
    emb.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => round(x.cast("double") * scale).cast("long")).as("v"))

  /** Squared L2 between two integer vectors — exact (fits a long for
    * realistic dims/scales). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** Assign every vector to its nearest centroid: `(vec_id, v, cid, dist)`;
    * ties on distance break by centroid id.
    *
    * Shape (r18): the k-row codebook folds into ONE broadcast array
    * column and the argmin runs inline per row — `aggregate` keeping the
    * lexicographically-least (dist, cid) struct, the exact tie-break the
    * previous window formulation encoded as `orderBy(dist, cid)`. The old
    * shape expanded n×k vector-carrying rows through a vec_id-hashed
    * exchange + row_number window; per Lloyd iteration that was the
    * dominant allocation AND the only shuffle (SCALE.md r18 measured the
    * same rewrite collapsing q_silhouette's x256 GC bimodality). Now an
    * assignment pass is shuffle-free — at 100 TB each iteration reads the
    * vectors once and exchanges nothing but the (cid, dim) update agg. */
  def assign(q: DataFrame, cents: DataFrame): DataFrame = {
    val codebook = cents
      .agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cbk"))
    val best = aggregate(col("cbk"),
      struct(lit(Long.MaxValue).as("dist"), lit(Int.MaxValue).as("cid")),
      (acc, c) => {
        val d = sqDist(col("v"), c.getField("cv"))
        when(d < acc.getField("dist") ||
            (d === acc.getField("dist") && c.getField("cid") < acc.getField("cid")),
          struct(d.as("dist"), c.getField("cid").as("cid")))
          .otherwise(acc)
      })
    q.crossJoin(broadcast(codebook))
      .select(col("vec_id"), col("v"), best.as("__best"))
      .select(col("vec_id"), col("v"),
        col("__best.cid").as("cid"), col("__best.dist").as("dist"))
  }

  /** Recompute integer centroids from an assignment: per (cid, dim),
    * `round(mean)` back onto the lattice. Clusters that lost every member
    * drop out (standard Lloyd behavior; deterministic here). */
  def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cid"), col("i"))
      .agg(round(sum(col("x")).cast("double") / count(lit(1))).cast("long").as("c"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        s => s.getField("c")).as("cv"))

  /** The centroids `(cid, cv)` the FINAL assignment of [[fit]] is computed
    * against (c_{iters-1}) — the codebook an IVF probe scores query
    * vectors on. Every step is deterministic, so deriving these separately
    * from a cached [[fit]] assignment yields exactly the generating
    * centroids. */
  def centroidsAfter(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Int = 1000): DataFrame = {
    val q = quantize(emb, idCol, vecCol, scale)
    // Seed: the k smallest vec_ids, re-labeled 0..k-1 by rank. Selecting
    // them explicitly (orderBy.limit → TakeOrderedAndProject, k rows to the
    // driver side of a broadcast) rather than `vec_id < k` keeps the init
    // correct for sparse or non-zero-based id spaces; for dense 0-based ids
    // (the harness tables) rank-1 == vec_id, so results are identical.
    var cents = q.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1)
        .cast("int").as("cid"), col("v").as("cv"))
    (1 until iters).foreach { _ => cents = update(assign(q, cents)) }
    cents
  }

  /** Run `iters` Lloyd iterations from the deterministic init; returns the
    * final assignment `(vec_id, v, cid, dist)`. */
  def fit(emb: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
      scale: Int = 1000): DataFrame =
    assign(quantize(emb, idCol, vecCol, scale),
      centroidsAfter(emb, idCol, vecCol, k, iters, scale))
}
