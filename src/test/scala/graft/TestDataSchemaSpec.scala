package graft

import org.apache.spark.sql.types._

/** Schema-drift tripwire for the harness parquet tables.
  *
  * The driver regenerated `/root/testdata` between rounds once already
  * (r10: events.ts flipped TIMESTAMP(NANOS) → TIMESTAMP(MICROS, NTZ)) and
  * the cost was 7 queries throwing + 3 silently-wrong streaming answers.
  * This spec makes the NEXT regeneration cost exactly one loud, named
  * failure before any query goes red: it asserts every table's column
  * names and types, with the known-variable columns (`events.ts` and the
  * date columns, which have shipped under multiple parquet timestamp
  * encodings) pinned to an explicit allow-list instead of a single type.
  */
class TestDataSchemaSpec extends SparkSpec {

  /** Accepted encodings for harness timestamp columns across testdata
    * generations: NANOS-as-long (legacy flag), MICROS NTZ (pandas/arrow
    * default), MICROS UTC-adjusted. */
  private val tsEncodings: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  private val dateLike: Set[DataType] =
    Set(DateType, TimestampNTZType, TimestampType)

  private def one(t: DataType): Set[DataType] = Set(t)

  // table -> ordered (column, accepted types)
  private val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
    "region" -> Seq("r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)),
    "nation" -> Seq("n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)),
    "customer" -> Seq("c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq("s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)),
    "part" -> Seq("p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq("o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> dateLike, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq("l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> dateLike),
    "events" -> Seq("event_id" -> one(LongType), "ts" -> tsEncodings,
      "user_id" -> one(LongType), "event_type" -> one(StringType),
      "value" -> one(DoubleType), "props" -> one(StringType)),
    "documents" -> Seq("doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)),
    "embeddings" -> Seq("vec_id" -> one(LongType),
      "embedding" -> one(ArrayType(FloatType, containsNull = true)),
      "label" -> one(IntegerType)))

  for ((table, cols) <- expected) test(s"testdata schema: $table") {
    // nanosAsLong so a NANOS-encoded generation probes as LongType instead
    // of failing the read outright (Spark has no nanos timestamp type)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf0/$table.parquet").schema
    val actual = schema.fields.map(f => f.name -> f.dataType).toSeq
    assert(actual.map(_._1) == cols.map(_._1),
      s"\nTESTDATA DRIFT: $table columns changed.\n" +
        s"  expected: ${cols.map(_._1).mkString(", ")}\n" +
        s"  actual:   ${actual.map(_._1).mkString(", ")}\n" +
        "Update graft loaders (core/Tables.scala) and this spec together.")
    for (((name, allowed), (_, got)) <- cols.zip(actual))
      assert(allowed.contains(got),
        s"\nTESTDATA DRIFT: $table.$name is $got, expected one of " +
          s"${allowed.mkString("{", ", ", "}")}.\n" +
          "A new parquet encoding shipped — extend the matching loader arm " +
          "(core/Tables.scala normalizeEventTs for events.ts) and this spec.")
  }

  // table -> rows at (sf0.001, sf0.01, sf0.1). EXACT — the generator seed
  // is pinned, so a regeneration that keeps schemas but changes counts
  // (seed or SF-dial change) fails HERE as one named test instead of as N
  // unexplained oracle mismatches (r11 verdict #4). Counts read from the
  // parquet footers 2026-08-14.
  private val expectedRows: Seq[(String, (Long, Long, Long))] = Seq(
    "region" -> ((5L, 5L, 5L)),
    "nation" -> ((25L, 25L, 25L)),
    "customer" -> ((150L, 1500L, 15000L)),
    "supplier" -> ((10L, 100L, 1000L)),
    "part" -> ((200L, 2000L, 20000L)),
    "orders" -> ((1500L, 15000L, 150000L)),
    "lineitem" -> ((6000L, 60000L, 600000L)),
    "events" -> ((1000L, 10000L, 100000L)),
    "documents" -> ((500L, 500L, 5000L)),
    "embeddings" -> ((500L, 500L, 2000L)))

  test("testdata cardinality: exact row counts per table per SF") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drift = for {
      (table, (n001, n01, n1)) <- expectedRows
      (sf, want) <- Seq("sf0.001" -> n001, "sf0.01" -> n01, "sf0.1" -> n1)
      got = spark.read.parquet(s"/root/testdata/$sf/$table.parquet").count()
      if got != want
    } yield s"  $sf/$table: expected $want rows, got $got"
    assert(drift.isEmpty,
      "\nTESTDATA DRIFT: row counts changed — the generator seed or SF " +
        "dial moved. Oracle rows will mismatch en masse; re-pin the counts " +
        "here once the new generation is understood:\n" + drift.mkString("\n"))
  }

  test("testdata schema: all three SFs agree") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (t <- expected.map(_._1)) {
      val s0 = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").schema
      for (sf <- Seq("sf0.01", "sf0.1")) {
        val s = spark.read.parquet(s"/root/testdata/$sf/$t.parquet").schema
        assert(s == s0,
          s"\nTESTDATA DRIFT: $t schema differs between sf0.001 and $sf:\n" +
            s"  sf0.001: $s0\n  $sf: $s")
      }
    }
  }
}
