package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft kernels are available on the SQL surface after registration") {
    // the GraftExtensions injector applies the same builders at session
    // build (`spark.sql.extensions`); with the suite-shared session already
    // alive we exercise the registry path + the injector's construction
    new graft.functions.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_simhash(array('a','b','c')) AS h, " +
        "graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c, " +
        "graft_winnow(array('a','b','c','d'), 4, 5) AS w").head()
    assert(r.getDouble(1) == 1.0)
    assert(r.getSeq[Long](2).length == 1)
    assert(r.getLong(0) == graft.functions.TextHashes.simhash(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Seq("a", "b", "c").map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])))
  }

  test("dupClusters: min-label connected components") {
    // components: {1,2,3} (chain), {10,11}, singleton edges none
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val out = Dedup.dupClusters(pairs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("dupClusters converges on a longer chain than one propagation round") {
    val pairs = (1L to 9L).map(i => (i, i + 1)).toDF("da", "db")
    val out = Dedup.dupClusters(pairs).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 10 && out.forall(_._2 == 1L))
  }

  test("dupClusters: iterative loop path (fast path disabled), decimal Σ convergence") {
    val pairs = (1L to 9L).map(i => (i, i + 1)).toDF("da", "db")
    val out = Dedup.dupClusters(pairs, smallGraphMaxEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 10 && out.forall(_._2 == 1L))
  }

  test("dupClusters: EMPTY pair sets converge (both id-type branches)") {
    // an empty near-dup pair set is a realistic call (no duplicates found);
    // the hash-sum convergence probe returns SQL null over an empty frame
    // and the stored-null compareTo NPE'd in round 2 (ADVICE r17) — both
    // loop branches must converge to an empty result instead
    val emptyStr = Seq.empty[(String, String)].toDF("da", "db")
    assert(Dedup.dupClusters(emptyStr, smallGraphMaxEdges = 0).isEmpty)
    val emptyLong = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(Dedup.dupClusters(emptyLong, smallGraphMaxEdges = 0).isEmpty)
    assert(Dedup.dupClusters(emptyLong).isEmpty) // driver fast path too
  }

  test("dupClusters: string ids take the changed-count convergence branch") {
    // non-integral ids can't use Σ-labels (ADVICE r2: sum over strings
    // crashed); chain forces several propagation rounds
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")).toDF("da", "db")
    val out = Dedup.dupClusters(pairs).orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"))
  }
}
