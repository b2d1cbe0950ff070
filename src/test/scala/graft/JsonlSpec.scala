package graft

import graft.sources.{Jsonl, Sinks}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Jsonl source: metadata-only open (sample-probed schema), pinned-schema
  * scans, malformed→null, gz transparency, LazyFrame row addressing; Sinks:
  * partitioned write round-trip. */
class JsonlSpec extends SparkSpec {

  private def writeTemp(name: String, lines: Seq[String], gz: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft_jsonl_")
    val p = dir.resolve(name)
    if (gz) {
      val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(p))
      out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
    } else Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  private val docs = Seq(
    """{"id": 1, "text": "alpha beta", "score": 0.5}""",
    """{"id": 2, "text": "gamma", "score": 1.25}""",
    """{"id": 3, "text": "delta epsilon zeta", "score": -2.0}""")

  test("probe infers schema from the head sample only; read pins it") {
    val path = writeTemp("d.jsonl", docs)
    val schema = Jsonl.probe(spark, path)
    assert(schema.fieldNames.sorted.toSeq == Seq("id", "score", "text"))
    val df = Jsonl.read(spark, path)
    assert(df.count() == 3)
    assert(df.where(col("score") > 0).select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("malformed lines degrade to nulls, not failures") {
    val path = writeTemp("bad.jsonl", docs :+ """{"id": oops not json""")
    val df = Jsonl.read(spark, path)
    assert(df.count() == 4)
    assert(df.where(col("id").isNull).count() == 1)
  }

  test("gzip input opens transparently") {
    val path = writeTemp("d.jsonl.gz", docs, gz = true)
    assert(Jsonl.read(spark, path).count() == 3)
  }

  test("LazyFrame open: row addressing under the pinned order") {
    val lf = Jsonl.open(spark, writeTemp("d.jsonl", docs), Seq("id"))
    assert(lf.nrow == 3 && lf.ncol == 3)
    val row2 = lf.rowsAt(Seq(2L)).select("id").collect()
    assert(row2.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("ORC round-trip: LazyFrame.orc opens with row addressing and pushdown") {
    import graft.core.LazyFrame
    val dir = Files.createTempDirectory("graft_orc_").toString + "/t"
    Jsonl.read(spark, writeTemp("d.jsonl", docs)).write.mode("overwrite").orc(dir)
    val lf = LazyFrame.orc(spark, dir, Seq("id"))
    assert(lf.nrow == 3)
    assert(lf.filter(col("score") > 0).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("partitioned sink round-trips and prunes") {
    val out = Files.createTempDirectory("graft_sinks_").toString + "/part"
    val df = Jsonl.read(spark, writeTemp("d.jsonl", docs))
      .withColumn("bucket", (col("id") % 2).cast("int"))
    Sinks.writePartitioned(df, out, Seq("bucket"))
    val back = spark.read.parquet(out).where(col("bucket") === 1)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }
}
