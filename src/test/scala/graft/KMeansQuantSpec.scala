package graft

import graft.operators.KMeansQuant
import org.apache.spark.sql.functions._

/** KMeansQuant: iterations improve (well-separated) clusterings, the final
  * assignment is truly nearest-centroid, and the whole fit is
  * deterministic run-to-run (the property the oracle depends on). */
class KMeansQuantSpec extends SparkSpec {

  private def data = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // 3 well-separated blobs in 8-d, ids interleaved so init (ids < k)
    // starts off-center
    (0 until 90).map { i =>
      val center = i % 3
      val v = Array.tabulate(8)(d => (center * 5.0 + rnd.nextGaussian() * 0.3 + d * 0.01).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def inertia(iters: Int): Long =
    KMeansQuant.fit(data, "vec_id", "embedding", 3, iters)
      .agg(sum(col("dist"))).collect()(0).getLong(0)

  test("more Lloyd iterations do not worsen inertia on separated blobs") {
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 <= i1, s"inertia rose: $i1 -> $i3")
  }

  test("sparse / non-zero-based id spaces still seed k full centroids") {
    import spark.implicits._
    // ids 1000, 1007, 1014, … — `vec_id < k` would seed ZERO centroids
    val sparse = data.withColumn("vec_id", col("vec_id") * 7 + 1000)
    val fitted = KMeansQuant.fit(sparse, "vec_id", "embedding", 3, 2)
    assert(fitted.select("cid").distinct().count() === 3)
    assert(fitted.count() === 90)
    // identical geometry to the dense-id fit: relabeling ids preserves the
    // rank-based init, so cluster memberships match exactly
    val dense = KMeansQuant.fit(data, "vec_id", "embedding", 3, 2)
      .select(col("vec_id"), col("cid")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sp = fitted.select((col("vec_id") - 1000) / 7, col("cid"))
      .collect().map(r => r.getDouble(0).toLong -> r.getInt(1)).toMap
    assert(sp === dense)
  }

  test("fit is deterministic and assignments are nearest-centroid") {
    val a = KMeansQuant.fit(data, "vec_id", "embedding", 3, 2)
    val b = KMeansQuant.fit(data, "vec_id", "embedding", 3, 2)
    val ra = a.select("vec_id", "cid", "dist").collect().map(_.toSeq).toSet
    assert(ra === b.select("vec_id", "cid", "dist").collect().map(_.toSeq).toSet)
    // recompute centroids from the final assignment; every row's dist must
    // equal the min distance over the centroids it was assigned against
    val q = KMeansQuant.quantize(data, "vec_id", "embedding")
    val cents = KMeansQuant.update(KMeansQuant.fit(data, "vec_id", "embedding", 3, 1))
    val re = KMeansQuant.assign(q, cents).select("vec_id", "cid", "dist")
      .collect().map(_.toSeq).toSet
    assert(re === ra)
  }
}
