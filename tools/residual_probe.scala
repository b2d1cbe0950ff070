// Probe: with the StaticInvoke residual wrapper (r16), extraction joins are
// single-equi-key — verify under Spark's DEFAULT strict
// requireAllClusterKeysForCoPartition that the cached index side does NOT
// re-exchange, and the rowsAt(Dataset) plan carries no InSet literal.
// Dev tool only. ASCII only.
import org.apache.spark.sql.functions._
println("conf = " + spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition"))
val key = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
val lf = graft.core.LazyFrame.parquet(spark, "/root/testdata/sf0.01/lineitem.parquet", key).cached()
spark.conf.set("graft.index.broadcastMaxRows", "1") // force the SHJ path
val q = lf.filter(col("l_quantity") >= 49.0)
val plan = q.queryExecution.executedPlan.toString
println("---- filter plan ----"); println(plan)
println("n = " + q.count())
import spark.implicits._
val ids = lf.which(col("l_quantity") > 45.0).select(col("row_id")).as[Long]
val r = lf.rowsAt(ids)
println("rowsAt(ds) n = " + r.count())
val rplan = r.queryExecution.executedPlan.toString
println("---- rowsAt(ds) plan (head) ----"); println(rplan.take(5000))
println("has InSet literal: " + (rplan.contains("INSET") || rplan.contains(" IN (")))
