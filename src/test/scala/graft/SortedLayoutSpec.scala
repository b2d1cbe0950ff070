package graft

import graft.sources.Sinks
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Sorted-layout write contract (r12 verdict #5): after
  * `Sinks.writeSorted`, the parquet footers must hold MANY row groups
  * with tight l_returnflag statistics, so an equality filter can prune
  * row groups — the thing the r12 probe proved IMPOSSIBLE on the
  * as-shipped single-row-group layout. */
class SortedLayoutSpec extends SparkSpec {

  private def footerStats(dir: String): Seq[(String, String)] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(conf)
    fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .flatMap { p =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try r.getFooter.getBlocks.asScala.map { b =>
          val s = b.getColumns.asScala
            .find(_.getPath.toDotString == "l_returnflag").get.getStatistics
          (new String(s.getMinBytes, "UTF-8"), new String(s.getMaxBytes, "UTF-8"))
        }.toSeq
        finally r.close()
      }.toSeq
  }

  test("writeSorted yields many row groups, most skippable for one value") {
    val src = s"$sf0/lineitem.parquet" // sf0.001: ~6k rows
    val out = new java.io.File("target/sorted_layout_spec").getAbsolutePath
    val df = spark.read.parquet(src)
    // tiny row groups so even sf0.001 produces several per file
    Sinks.writeSorted(df, out, Seq("l_returnflag", "l_shipdate"),
      rowGroupBytes = 64 << 10)
    val stats = footerStats(out)
    assert(stats.size > 3, s"expected many row groups, got ${stats.size}")
    // sorted layout ⇒ row-group [min,max] ranges are tight: a meaningful
    // fraction of groups (≥ 1/4 — bounded below by the two non-R flag
    // values' ~half share, minus boundary-straddling groups) must EXCLUDE
    // 'R' entirely, i.e. be skippable for the flagship filter, and at
    // least one must contain it. The as-shipped layout has ZERO skippable
    // groups — that's the delta this spec locks in.
    val skippable = stats.count { case (mn, mx) => mx < "R" || mn > "R" }
    val containing = stats.size - skippable
    assert(containing >= 1, s"no group contains R: $stats")
    assert(skippable * 4 >= stats.size,
      s"sorted layout should make ≥1/4 of groups skippable: $skippable/${stats.size}")

    // the filtered read still pushes down and returns identical results
    val filtered = spark.read.parquet(out).where(col("l_returnflag") === "R")
    val plan = filtered.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("EqualTo(l_returnflag,R)"), s"no pushdown:\n$plan")
    assert(filtered.count() ==
      df.where(col("l_returnflag") === "R").count())
  }
}
