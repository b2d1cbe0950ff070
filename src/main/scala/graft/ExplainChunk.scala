import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
object ExplainChunk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    def rep(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); df.queryExecution.toRdd.count()
        (System.nanoTime()-t0)/1e9 }
      println(f"$label%-22s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    val k = 5
    val pos = docs.select(col("doc_id"), posexplode(shingles(tokens(col("text")), k)))
      .select(col("doc_id"), col("pos"), md5Hash60(col("col")).as("h"))
    rep("pos grams")(pos)
    val shingOnly = docs.select(col("doc_id"), posexplode(shingles(tokens(col("text")), k)))
    rep("shingles+explode")(shingOnly)
    val shingNoExpl = docs.select(col("doc_id"), shingles(tokens(col("text")), k).as("s"))
    rep("shingles only")(shingNoExpl)
    rep("pipeline")(graft.operators.Curation.pipelineManifest(spark, "/root/testdata/sf0.1"))
    spark.stop()
  }
}
