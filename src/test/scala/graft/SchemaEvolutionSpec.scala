package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Training-corpus batches evolve: later shards add columns, and
  * micro-batch ingests leave small-file debris. Both must be handled by
  * the read/write surface, not ad-hoc scripts. */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema read unions evolving parquet batches; missing cols are null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve_").toString
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Seq((2L, "beta", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "lang", "text"))
    val rows = merged.orderBy("doc_id").collect()
    assert(rows(0).getAs[String]("lang") == null)
    assert(rows(1).getAs[String]("lang") == "en")
  }

  test("unionByName with allowMissingColumns aligns heterogeneous frames") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("doc_id", "text")
    val b = Seq((2L, 0.9)).toDF("doc_id", "quality")
    val u = a.unionByName(b, allowMissingColumns = true)
    assert(u.columns.sorted.toSeq == Seq("doc_id", "quality", "text"))
    assert(u.count() == 2 && u.where(col("quality").isNull).count() == 1)
  }

  test("compaction: repartition-write collapses small-file debris") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact_").toString
    (1 to 200).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/raw")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$dir/raw") > 8)
    // the compaction pass: one shuffle-free coalesce to target file count
    spark.read.parquet(s"$dir/raw").coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/compact")
    assert(parquetFiles(s"$dir/compact") <= 2)
    assert(spark.read.parquet(s"$dir/compact").count() == 200)
  }
}
