// Broadcast-vs-SHJ crossover probe for the extraction join (ASCII only).
// For each rung dir: build the index once, then time 3 warm filter counts
// under (a) the broadcast path and (b) the co-partitioned SHUFFLE_HASH
// path (graft.index.broadcastMaxRows=0). Dev tool only.
import org.apache.spark.sql.functions._
val key = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
def t(f: => Long): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}
val pred = col("l_returnflag") === "R"
for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/target/ladder/x4")) {
  for (mode <- Seq("broadcast", "shj")) {
    spark.conf.set("graft.index.broadcastMaxRows",
      if (mode == "broadcast") "8000000" else "0")
    val lf = graft.core.LazyFrame.parquet(spark, s"$dir/lineitem.parquet", key).cached()
    lf.filter(pred).count() // warm
    val times = (1 to 3).map(_ => t(lf.filter(pred).count()))
    println(f"[xover] dir=$dir%-40s mode=$mode%-9s nrow=${lf.nrow}%-9d " +
      times.map(x => f"$x%.2f").mkString("runs=[", ", ", "]"))
    lf.reopen()
  }
}
System.exit(0)
