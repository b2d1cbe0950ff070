// Probe: why is head(10) slow at x64 while rowsRange(101,200)/tail are
// scale-flat? Times each row-addressed piece and prints the executed plan.
// Dev tool only. ASCII only.
val dir = sys.env.getOrElse("PROBE_DIR", "/root/repo/target/ladder/x64")
def t[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"[phase] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%9.2f s")
  r
}
import org.apache.spark.sql.functions._
val key = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
val lf = graft.core.LazyFrame.parquet(spark, s"$dir/lineitem.parquet", key)
t("index build") { lf.cached() }
t("nrow") { lf.nrow }
t("head warm0 (builds idxByRow)") { lf.head(10).count() }
t("head warm1") { lf.head(10).count() }
t("head warm2") { lf.head(10).count() }
t("range(101,200) warm1") { lf.rowsRange(101, 200).count() }
t("range(101,200) warm2") { lf.rowsRange(101, 200).count() }
t("range(1,10) warm") { lf.rowsRange(1, 10).count() }
t("tail warm") { lf.tail(10).count() }
val h = lf.head(10)
println("=== head(10) executed plan ===")
println(h.queryExecution.executedPlan.toString.take(6000))
System.exit(0)
