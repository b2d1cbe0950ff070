package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("GraftExtensions injects functions at session build time") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT graft_simhash(array('a','b','c')) AS h, " +
          "graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head()
      assert(r.getDouble(1) == 1.0)
      assert(r.getLong(0) == graft.functions.TextHashes.simhash(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Seq("a", "b", "c").map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])))
    } finally () // session shared with SharedSpark's context; don't stop it
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
}
