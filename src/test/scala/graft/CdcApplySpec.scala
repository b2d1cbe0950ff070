package graft

import graft.operators.AdvancedQueries
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** MERGE/upsert semantics + the one-keyed-shuffle plan contract. */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  test("insert/update/delete semantics on a known change set") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (2L, "U", "b2", 25.0),  // update
      (3L, "D", null.asInstanceOf[String], 0.0), // delete
      (4L, "I", "d", 40.0))   // insert of a new key
      .toDF("k", "op", "new_name", "new_bal")
    val got = AdvancedQueries.cdcApply(base, changes, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (4L, "d", 40.0)))
  }

  test("apply ∘ apply composes (two change sets = sequential snapshots)") {
    val base = Seq((1L, "a", 1.0)).toDF("k", "name", "bal")
    val c1 = Seq((2L, "I", "b", 2.0)).toDF("k", "op", "new_name", "new_bal")
    val c2 = Seq((1L, "D", "", 0.0), (2L, "U", "b2", 9.0))
      .toDF("k", "op", "new_name", "new_bal")
    val s2 = AdvancedQueries.cdcApply(
      AdvancedQueries.cdcApply(base, c1, "k"), c2, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(s2.toSeq == Seq((2L, "b2", 9.0)))
  }

  test("plan: one co-partitioned join, both exchanges hash on the key only") {
    val base = spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("n"), col("id")).as("name"), (col("id") * 2.0).as("bal"))
    val changes = spark.range(0, 100).select(col("id").as("k"),
      when(col("id") % 2 === 0, "U").otherwise("D").as("op"),
      lit("x").as("new_name"), lit(1.0).as("new_bal"))
    val df = AdvancedQueries.cdcApply(base, changes, "k")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([^,]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    // exactly the two input-side shuffles, both keyed on k — no post-join
    // exchange, no broadcast-materialized driver state
    assert(exchanges.size == 2, s"expected 2 keyed exchanges, got $exchanges:\n$plan")
    assert(exchanges.forall(_.startsWith("k#")), s"non-key exchange: $exchanges")
  }
}
