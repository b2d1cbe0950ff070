package graft

import graft.sources.Sinks
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Z-order layout contract: after `Sinks.writeZOrder(c1, c2)`, row-group
  * footer stats form small boxes in BOTH dimensions, so predicates on
  * either column prune groups — the delta over `writeSorted`, whose
  * trailing-column stats span everything (measured here side by side). */
class ZOrderSpec extends SparkSpec {

  /** Per-row-group (min,max) of an int64 column across all files. */
  private def intStats(dir: String, colName: String): Seq[(Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(conf)
    fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .flatMap { p =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try r.getFooter.getBlocks.asScala.map { b =>
          val s = b.getColumns.asScala
            .find(_.getPath.toDotString == colName).get.getStatistics
          (s.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            s.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        }.toSeq
        finally r.close()
      }.toSeq
  }

  /** Row groups a range predicate lo..hi on `colName` must READ. */
  private def reading(dir: String, colName: String, lo: Long, hi: Long): (Int, Int) = {
    val st = intStats(dir, colName)
    (st.count { case (mn, mx) => mx >= lo && mn <= hi }, st.size)
  }

  test("writeZOrder: row groups skippable on BOTH dims; linear sort only on one") {
    val df = spark.read.parquet(s"$sf0/lineitem.parquet")
    val zDir = new java.io.File("target/zorder_spec_z").getAbsolutePath
    val sDir = new java.io.File("target/zorder_spec_s").getAbsolutePath
    Sinks.writeZOrder(df, zDir, "l_partkey", "l_suppkey",
      bits1 = 8, bits2 = 4, rowGroupBytes = 32 << 10)
    Sinks.writeSorted(df, sDir, Seq("l_partkey", "l_suppkey"),
      rowGroupBytes = 32 << 10)

    // leading dim (l_partkey 0..199): both layouts prune a mid-range probe
    val (zP, zN) = reading(zDir, "l_partkey", 80, 99)
    val (sP, sN) = reading(sDir, "l_partkey", 80, 99)
    info(s"partkey probe: zorder reads $zP/$zN, sorted reads $sP/$sN")
    assert(zN > 3 && sN > 3, s"expected several row groups: z=$zN s=$sN")
    assert(zP * 2 <= zN, s"zorder should skip >=half on leading dim: $zP/$zN")
    assert(sP * 2 <= sN, s"sorted should skip >=half on leading dim: $sP/$sN")

    // trailing dim alone (l_suppkey 0..9): the delta this layout buys.
    // Linear sort localizes only the leading column — suppkey spans are
    // near-global per group — while the z-curve confines suppkey to
    // aligned tiles (the {8,9} probe lies in a tile holding only 20% of
    // the y-mass; a probe inside the fullest tile would bound skip at
    // that tile's mass instead — tile alignment is the curve's grain).
    val (zS, _) = reading(zDir, "l_suppkey", 8, 9)
    val (sS, _) = reading(sDir, "l_suppkey", 8, 9)
    info(s"suppkey probe: zorder reads $zS/$zN, sorted reads $sS/$sN")
    assert(zS * 2 <= zN, s"zorder should skip >=half on trailing dim: $zS/$zN")
    assert(zS.toDouble / zN < sS.toDouble / sN,
      s"zorder must out-prune linear sort on the trailing dim: z=$zS/$zN s=$sS/$sN")

    // results identical to filtering the original, and pushdown reaches scan
    val zRead = spark.read.parquet(zDir)
      .where(col("l_suppkey").between(8, 9) && col("l_partkey").between(80, 99))
    val expected = df
      .where(col("l_suppkey").between(8, 9) && col("l_partkey").between(80, 99))
    assert(zRead.count() == expected.count())
    val plan = zRead.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThanOrEqual(l_suppkey,8)"), s"no pushdown:\n$plan")
  }
}
