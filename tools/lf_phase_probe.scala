// Phase-timed LazyFrame probe (run via spark-shell -i, repo classes on the
// classpath): splits the x64 lf cliff into its phases -- index build (keyed
// sort + offsets count + idx persist), first extraction (join against the
// fresh cache), repeat extractions. Dev tool only, not part of the library.
// ASCII only: spark-shell reads this with the platform default charset.
val dir = sys.env.getOrElse("PROBE_DIR", "/root/repo/target/ladder/x64")
def t[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"[phase] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%9.2f s")
  r
}
import org.apache.spark.sql.functions._
val key = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
val lf = t("open (metadata only)") {
  graft.core.LazyFrame.parquet(spark, s"$dir/lineitem.parquet", key)
}
t("index build (cached())") { lf.cached() }
val n = t("dim (cached count)") { lf.nrow }
println(s"[phase] nrow=$n")
val pred = col("l_returnflag") === "R"
t("extraction 1 (filter count)") { lf.filter(pred).count() }
t("extraction 2") { lf.filter(pred).count() }
t("extraction 3") { lf.filter(pred).count() }
println(lf.filter(pred).queryExecution.executedPlan.toString.take(4000))
System.exit(0)
