package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event operators Spark has no native relational form for. */
object Events {

  /** AS-OF join: for every left row, the single most recent right row
    * with `rightTs <= leftTs` in the same key group (the time-series
    * "latest value at event time" join — DuckDB/kdb `ASOF JOIN`,
    * pandas `merge_asof`).
    *
    * Spark-first shape: instead of a range-predicate join (which
    * Catalyst plans as a broadcast-nested-loop or a sort-merge with
    * per-row rescans), the two sides UNION into one relation tagged by
    * side, and ONE window pass per key carries the latest right payload
    * forward (`last(..., ignoreNulls)` over rows ordered by
    * (ts, side)). Cost: one hash shuffle on the key + one sort — the
    * same plan family as any windowed aggregation, linear in the data,
    * no pair blowup; skew is governed by the key exactly like a groupBy.
    * A right row sharing a left row's timestamp matches (<= semantics);
    * same-instant right rows resolve deterministically to the largest
    * `tieBreak` value.
    *
    * `rightCols` are the right-side payload columns carried onto each
    * left row; they come back null when no right row precedes it.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               rightCols: Seq[String],
               tieBreak: String = null): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin: no right payload columns")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(rightCols.contains),
      "asofJoin: right payload columns collide with left columns")
    val rTb = if (tieBreak == null) lit(0L) else col(tieBreak).cast("long")
    val lSel: Seq[Column] =
      Seq(col(keyCol), lit(1).as("_side"), col(leftTsCol).as("_ts"),
        lit(0L).as("_tb")) ++
        leftCols.filterNot(_ == keyCol).map(c => col(c)) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val rSel: Seq[Column] =
      Seq(col(keyCol), lit(0).as("_side"), col(rightTsCol).as("_ts"),
        rTb.as("_tb")) ++
        leftCols.filterNot(_ == keyCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c))
    val all = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    // right rows sort BEFORE left rows at equal ts (side 0 < 1) so the
    // <= match holds; among same-instant right rows the largest
    // tieBreak sorts last and wins the carry
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(all) { case (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select((leftCols.map(c => col(c)) ++ rightCols.map(c => col(c))): _*)
  }

  /** BAND (range-window) join: every (left, right) pair in the same key
    * group whose timestamps differ by at most `maxGap` (inclusive, in
    * the ts columns' units — pass epoch seconds/millis, not raw
    * timestamps). The naive formulation is an inequality join Catalyst
    * can only plan as a nested loop; here both sides bucket by
    * `ts div maxGap` and the RIGHT side replicates into its own and both
    * neighboring buckets, making the join a plain EQUI-join on
    * (key, bucket) with a post-filter — any qualifying pair shares a
    * bucket with one of the three right copies, and pair work is bounded
    * by per-bucket density, never |L|×|R|. Timestamps must be
    * non-negative (`div` truncation).
    */
  def bandJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               maxGap: Long): DataFrame = {
    require(maxGap > 0, "bandJoin: maxGap must be positive")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => c != keyCol && right.columns.contains(c)),
      "bandJoin: column names collide across sides (rename first)")
    val l = left.withColumn("_b",
      expr(s"CAST($leftTsCol AS BIGINT) div $maxGap"))
    val r = right.withColumn("_b0",
        expr(s"CAST($rightTsCol AS BIGINT) div $maxGap"))
      .withColumn("_b", explode(array(col("_b0") - 1, col("_b0"),
        col("_b0") + 1)))
      .drop("_b0")
    l.join(r, Seq(keyCol, "_b"))
      .filter(abs(col(leftTsCol).cast("long") -
        col(rightTsCol).cast("long")) <= maxGap)
      .drop("_b")
  }
}
