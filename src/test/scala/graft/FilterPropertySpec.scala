package graft

import graft.core.LazyFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

case class FilterPropRow(id: Long, i: Long, d: Double, s: String)

/** SURVEY §5.2 item 3: randomized differential testing — for random tables
  * and random (column, op, literal) picks, the engine filter must agree
  * with an in-memory Scala model (the same ⟨engine, independent model⟩
  * pattern the reference's vignette uses against read.table/SQLite). */
class FilterPropertySpec extends SparkSpec {
  import spark.implicits._

  private type R = FilterPropRow
  private def R(id: Long, i: Long, d: Double, s: String) = FilterPropRow(id, i, d, s)

  private val ops: Seq[(String, (Double, Double) => Boolean, (Column, Column) => Column)] = Seq(
    ("==", _ == _, _ === _), ("!=", _ != _, _ =!= _),
    ("<", _ < _, _ < _), ("<=", _ <= _, _ <= _),
    (">", _ > _, _ > _), (">=", _ >= _, _ >= _))

  test("random single-column comparisons: engine ≡ in-memory model") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 8) {
      val rows = (1 to 300).map { i =>
        R(i.toLong, rnd.nextInt(20).toLong, math.rint(rnd.nextDouble() * 100) / 10,
          "s" + rnd.nextInt(10))
      }
      val df = rows.toDF()
      val lf = LazyFrame.fromDataFrame(df, Seq("id"))
      for ((name, model, colOp) <- ops) {
        // integer literal comparison
        val litI = rnd.nextInt(20).toLong
        val gotI = lf.filterFast(colOp(col("i"), lit(litI))).count()
        val expI = rows.count(r => model(r.i.toDouble, litI.toDouble))
        assert(gotI == expI, s"round $round op $name int: $gotI != $expI")
        // double literal comparison
        val litD = math.rint(rnd.nextDouble() * 100) / 10
        val gotD = lf.filterFast(colOp(col("d"), lit(litD))).count()
        val expD = rows.count(r => model(r.d, litD))
        assert(gotD == expD, s"round $round op $name dbl: $gotD != $expD")
        // string comparison (binary collation, like strcmp)
        val litS = "s" + rnd.nextInt(10)
        val gotS = lf.filterFast(colOp(col("s"), lit(litS))).count()
        val expS = rows.count { r =>
          val c = r.s.compareTo(litS)
          name match {
            case "==" => c == 0; case "!=" => c != 0
            case "<" => c < 0; case "<=" => c <= 0
            case ">" => c > 0; case ">=" => c >= 0
          }
        }
        assert(gotS == expS, s"round $round op $name str: $gotS != $expS")
      }
      // which ∘ rowsAt ≡ filter on the same random data
      val ids = lf.which(col("i") > 10).collect().map(_.getLong(0)).toSeq
      assert(ids.length == rows.count(_.i > 10))
    }
  }
}
