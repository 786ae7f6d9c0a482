package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-based sweep operators, library surface for q175/q184: both
  * replace an O(n²)-per-group self-join with keyed windows over one
  * partitioning — the shapes that survive a 100× scale-up.
  */
object SweepOps {

  /** Merge overlapping `[startCol, endCol)` intervals per key and
    * aggregate coverage: returns one row per key with `n_blocks`,
    * `covered` (Σ merged block lengths) and `longest` (max block
    * length), all in the start/end columns' integer units.
    *
    * Sweep-line form: a running max of PRIOR interval ends marks block
    * starts, a running sum of block-start flags numbers the blocks,
    * then two keyed aggregations. One shuffle by `keyCols`; every
    * window sits inside that same partitioning. `tieCols` completes a
    * deterministic total order for rows sharing (start, end).
    */
  def intervalUnion(df: DataFrame, keyCols: Seq[String],
                    startCol: String, endCol: String,
                    tieCols: Seq[String]): DataFrame = {
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((Seq(startCol, endCol) ++ tieCols).map(col): _*)
    val prevMax = max(col(endCol)).over(ord.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new_block",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__block", sum(col("__new_block"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keyCols :+ "__block").map(col): _*)
      .agg(min(col(startCol)).as("__b_start"), max(col(endCol)).as("__b_end"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("__b_end") - col("__b_start")).as("covered"),
        max(col("__b_end") - col("__b_start")).as("longest"))
  }

  /** Two-dimensional skyline (pareto frontier, both dimensions
    * maximized) per scope: keeps the rows not dominated on integer
    * columns (`xCol`, `yCol`) — q has x' ≥ x, y' ≥ y and one strict.
    * Window form: max(y) over STRICTLY larger x (integer x makes the
    * RANGE bound `-1` exactly strictness) plus max(y) within the same
    * x; equal-(x, y) rows all survive (neither dominates). Both
    * windows are scope-keyed.
    */
  def skyline2D(df: DataFrame, scopeCols: Seq[String],
                xCol: String, yCol: String): DataFrame = {
    val strictlyLargerX = Window.partitionBy(scopeCols.map(col): _*)
      .orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameX = Window.partitionBy((scopeCols :+ xCol).map(col): _*)
    df.withColumn("__pmax", max(col(yCol)).over(strictlyLargerX))
      .withColumn("__xmax", max(col(yCol)).over(sameX))
      .filter((col("__pmax").isNull || col(yCol) > col("__pmax")) &&
        col(yCol) === col("__xmax"))
      .drop("__pmax", "__xmax")
  }
}
