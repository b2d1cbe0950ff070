package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.Row

/** Randomized differential test: AsOfJoin (backward and forward) must equal
  * a straightforward in-memory model on arbitrary data — including NULL
  * payloads on the matched row (which a naive last(ignoreNulls) skips past;
  * the marker-struct implementation must not). Right-side (key, ts) pairs
  * are unique per the as-of contract (ties among identical timestamps have
  * no defined winner in any engine). */
class AsOfJoinPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(17)

  private def model(left: Seq[(Long, Long)], right: Map[Long, Seq[(Long, Option[String])]],
      forward: Boolean): Map[(Long, Long), Option[String]] =
    left.map { case (k, t) =>
      val cands = right.getOrElse(k, Nil)
      val best =
        if (forward) cands.filter(_._1 >= t).sortBy(_._1).headOption
        else cands.filter(_._1 <= t).sortBy(_._1).lastOption
      (k, t) -> best.flatMap(_._2)
    }.toMap

  test("backward and forward as-of equal the in-memory model (nulls included)") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val keys = 1L to 6L
      val left = for {
        k <- keys
        _ <- 1 to 30
      } yield (k, rnd.nextInt(1000).toLong)
      val right = keys.map { k =>
        val ts = rnd.shuffle((0 until 1000).toList).take(20).map(_.toLong)
        k -> ts.map(t => (t, if (rnd.nextBoolean()) Some(s"v${k}_$t") else None))
      }.toMap

      val leftDf = left.toDF("k", "t")
      val rightDf = right.toSeq.flatMap { case (k, rows) =>
        rows.map { case (t, v) => (k, t, v.orNull) }
      }.toDF("k", "rt", "payload")

      for (forward <- Seq(false, true)) {
        val out = AsOfJoin(leftDf, rightDf, "k", "t", "rt",
            Map("payload" -> "got"), forward = forward)
          .collect().map { r: Row =>
            (r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("t"))) ->
              Option(r.getString(r.fieldIndex("got")))
          }.toMap
        val want = model(left, right, forward)
        // left rows may repeat (k, t); compare on the distinct key space
        assert(out === want.filterKeys(out.contains).toMap,
          s"trial $trial forward=$forward")
        assert(want.keySet.subsetOf(out.keySet))
      }
    }
  }
}
