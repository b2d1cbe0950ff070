package graft

import graft.operators.HyperLogLog
import org.apache.spark.sql.functions._

/** HyperLogLog: estimate lands within the analytic error band, and
  * registers merge by element-wise max (the property that makes HLL the
  * distributed/mergeable distinct counter). */
class HyperLogLogSpec extends SparkSpec {

  test("estimate within the analytic error band (~1.04/√m)") {
    import spark.implicits._
    // 7321 distinct keys with repeats; m=256 → σ ≈ 6.5%
    val df = (1 to 20000).map(i => s"user_${i % 7321}").toDF("k")
    val e = HyperLogLog.estimate(HyperLogLog.registers(df, "k"))
      .collect()(0).getAs[Double]("est")
    assert(math.abs(e - 7321) / 7321.0 < 0.2, s"estimate $e vs exact 7321")
  }

  test("registers of a union equal the element-wise max of the parts") {
    import spark.implicits._
    val a = (1 to 3000).map(i => s"x$i").toDF("k")
    val b = (2000 to 5000).map(i => s"x$i").toDF("k")
    val merged = HyperLogLog.registers(a, "k").withColumnRenamed("mj", "ma")
      .join(HyperLogLog.registers(b, "k").withColumnRenamed("mj", "mb"), "bucket")
      .select(col("bucket"), greatest(col("ma"), col("mb")).as("mj"))
    val whole = HyperLogLog.registers(a.union(b), "k")
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }
}
