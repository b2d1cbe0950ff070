package graft

import graft.core.Tables
import graft.sources.Sinks
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Write-time parquet bloom filters ([[Sinks.writeWithBloom]]): the
  * filters must actually land in the footers (for the named columns
  * ONLY), and reads through them must stay exact. The measured row-group
  * skip lives in BloomSkipProbe / SCALE.md (at sf0.001 there is only ~1
  * row group, so skip is not assertable here). */
class ParquetBloomSpec extends SparkSpec {

  test("writeWithBloom: footer carries SBBF for the named column only; reads exact") {
    val li = Tables.lineitem(spark, sf0)
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_").toString
    Sinks.writeWithBloom(li, dir, Seq("l_partkey" -> 2000L))

    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(conf)
    var groups = 0
    var partkeyBloom = 0
    var orderkeyBloom = 0
    fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).foreach { p =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try r.getFooter.getBlocks.asScala.foreach { b =>
          groups += 1
          def bloomOf(c: String) = r.getBloomFilterDataReader(b)
            .readBloomFilter(b.getColumns.asScala.find(_.getPath.toDotString == c).get)
          if (bloomOf("l_partkey") != null) partkeyBloom += 1
          if (bloomOf("l_orderkey") != null) orderkeyBloom += 1
        } finally r.close()
      }
    assert(groups > 0)
    assert(partkeyBloom == groups, s"bloom missing: $partkeyBloom of $groups groups")
    assert(orderkeyBloom == 0, "bloom written for a column that was not asked for")

    // point lookups through the bloom-filtered copy are exact
    val k = li.select(col("l_partkey")).head().getLong(0)
    val expect = li.where(col("l_partkey") === k)
      .agg(count(lit(1)), sum(col("l_quantity"))).head().toSeq
    val got = spark.read.parquet(dir).where(col("l_partkey") === k)
      .agg(count(lit(1)), sum(col("l_quantity"))).head().toSeq
    assert(got == expect)
  }
}
