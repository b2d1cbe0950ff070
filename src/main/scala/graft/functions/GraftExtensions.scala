package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** `SparkSessionExtensions` injector: registers the graft kernels at
  * session-build time, so clusters launched with
  *
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * get `graft_minhash`, `graft_simhash`, `graft_winnow`, `graft_cosine`,
  * `graft_dot`, `graft_hyperplane_bucket` in SQL and the Column API without
  * any driver-side registration call. Programmatic sessions can instead use
  * `GraftFunctions.register(spark)` (same builders).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, out: DataType, method: String, in: Seq[DataType]) =
    (FunctionIdentifier(name),
      new ExpressionInfo(TextHashes.getClass.getName, name),
      (e: Seq[Expression]) => StaticInvoke(TextHashes.getClass, out, method, e,
        inputTypes = in, propagateNull = true, returnNullable = false): Expression)

  override def apply(ext: SparkSessionExtensions): Unit = {
    val longs = ArrayType(LongType, containsNull = false)
    Seq(
      fn("graft_minhash", longs, "minhash", Seq(ArrayType(StringType), IntegerType)),
      fn("graft_simhash", LongType, "simhash", Seq(ArrayType(StringType))),
      fn("graft_winnow", longs, "winnow", Seq(ArrayType(StringType), IntegerType, IntegerType)),
      fn("graft_cosine", DoubleType, "cosineF", Seq(ArrayType(FloatType), ArrayType(FloatType))),
      fn("graft_dot", DoubleType, "dotF", Seq(ArrayType(FloatType), ArrayType(FloatType))),
      fn("graft_hyperplane_bucket", IntegerType, "hyperplaneBucket",
        Seq(ArrayType(FloatType), IntegerType, IntegerType)),
      // md5-60 family: reproducible by ANSI-ish SQL (see TextHashes)
      fn("graft_md5_60", LongType, "md5Hash60", Seq(StringType)),
      fn("graft_simhash60", LongType, "simhash60", Seq(ArrayType(StringType))),
      fn("graft_winnow60", longs, "winnow60",
        Seq(ArrayType(StringType), IntegerType, IntegerType)),
      fn("graft_hyperplane_bucket_md5", IntegerType, "hyperplaneBucketMd5",
        Seq(ArrayType(FloatType), IntegerType, IntegerType)),
      fn("graft_byte_entropy", DoubleType, "byteEntropy", Seq(BinaryType)),
      fn("graft_distinct_bytes", IntegerType, "distinctBytes", Seq(BinaryType)),
      fn("graft_fake_dim", IntegerType, "fakeDim", Seq(BinaryType, IntegerType))
    ).foreach(ext.injectFunction)
    // similarity cross joins plan as tiled equi-joins, not BNLJ
    ext.injectOptimizerRule(_ => graft.plans.TiledSimilarityJoin)
    // pure band-predicate joins (p BETWEEN s AND e) plan as bin equi-joins
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoin)
  }
}
