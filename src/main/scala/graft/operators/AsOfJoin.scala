package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively but every
  * time-series/feature-store pipeline needs: for each left row, attach the
  * most recent right row with `rightTs <= leftTs` per key.
  *
  * Implementation is the composition path (SURVEY preference (a)): a tagged
  * union + one window pass —
  *
  *   1. union left and right rows tagged by side (right sorts before left
  *      at equal timestamps → inclusive `<=` semantics, matching DuckDB's
  *      ASOF JOIN),
  *   2. `last_value(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY
  *      ts, side ROWS UNBOUNDED PRECEDING)` carries the latest right
  *      payload forward,
  *   3. keep only left rows.
  *
  * Cost: ONE shuffle on the key (both inputs together), one sort within
  * partitions — strictly better than the naive range-join (which explodes)
  * and equal to a dedicated merge-join implementation in exchanges. Skewed
  * keys inherit the window operator's skew behavior; salt or split hot
  * keys upstream if a single entity dominates.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side (its `payloadCols` are carried over)
    * @param key       equi-join key column name (present in both)
    * @param leftTs    event-time column in `left`
    * @param rightTs   event-time column in `right`
    * @param payloadCols columns of `right` to attach (renamed as given)
    * @param forward   false (default): most recent right row with
    *                  `rightTs <= leftTs` (DuckDB ASOF semantics);
    *                  true: EARLIEST right row with `rightTs >= leftTs` —
    *                  the "next event after" lookup (label attribution,
    *                  time-to-event features). Same single-shuffle window
    *                  plan, ordered descending.
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payloadCols: Map[String, String],
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val srcNames = payloadCols.keys.toSeq
    val outNames = srcNames.map(payloadCols)

    val taggedRight = right.select(
      (col(key) +: col(rightTs).as("__t") +: lit(0).as("__side") +:
        srcNames.map(c => col(c).as(s"__p_$c")) ++:
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(key) +: col(leftTs).as("__t") +: lit(1).as("__side") +:
        srcNames.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++:
        leftCols.filterNot(_ == key).map(col)): _*)

    // Backward: ascending time, right-before-left at ties ⇒ inclusive <=.
    // Forward: descending time, right-before-left at ties ⇒ inclusive >=;
    // last-seen in descending order is the EARLIEST qualifying right row.
    val ordering =
      if (forward) Seq(col("__t").desc, col("__side"))
      else Seq(col("__t"), col("__side"))
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry a (ts, payload) marker struct rather than the bare payload:
    // the marker is non-null exactly on right rows, so a legitimately-NULL
    // payload in the most recent right row is preserved (ASOF semantics)
    // instead of last(ignoreNulls) skipping back to an older right row.
    val carried = taggedRight.unionByName(taggedLeft)
      .select((col(key) +: col("__t") +: col("__side") +:
        leftCols.filterNot(_ == key).map(col)) ++
        srcNames.map(c => last(
          when(col("__side") === 0, struct(col("__t").as("t"), col(s"__p_$c").as("p"))),
          ignoreNulls = true).over(w).getField("p")
          .as(payloadCols(c))): _*)

    carried.where(col("__side") === 1)
      .select((leftCols.map(col) ++ outNames.map(col)): _*)
  }
}
