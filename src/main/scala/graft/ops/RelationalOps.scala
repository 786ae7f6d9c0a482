package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators distilled from the reference's dplyr verbs
  * (SURVEY.md §2). Each is a composable `DataFrame => DataFrame` — the
  * direct Spark analog of the reference's `df %>% verb()` pipeline style
  * (reference: `/root/reference/Tutorial.R`, `Field Control.R`,
  * `all coverages.R`; see per-op citations).
  *
  * Scale posture: every op is a single Window/Aggregate over explicit
  * partition keys — one shuffle on the group keys, no driver-side loops,
  * no collect. At 100 TB the partition keys (e.g. gameId, playId,
  * frameId / orderkey) are high-cardinality, so partitions stay small and
  * the plans survive a 1000-executor scale-out unchanged.
  */
object RelationalOps {

  /** D7 (Tutorial.R:173-176): non-reducing grouped indicator — "does any
    * row in my group satisfy `pred`" — broadcast back to every row.
    * dplyr's grouped `mutate(flag = sum(pred) > 0)` is a window
    * aggregate in Spark, NOT a groupBy (SURVEY.md §7.4).
    */
  def groupIndicator(keys: Seq[String], pred: Column, out: String)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn(out, sum(when(pred, 1).otherwise(0)).over(w) > 0)
  }

  /** D8/E3 (Tutorial.R:182-186): attach scalar values from a group's
    * distinguished row (the "ball row") to every row of the group, as
    * `max(when(pred, col)) over (partition by keys)`. Avoids the
    * reference's self-join (C4, Field Control.R:226-241) — one window
    * shuffle instead of a join.
    */
  def attachAnchor(keys: Seq[String], pred: Column, cols: Map[String, Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    cols.foldLeft(df) { case (d, (out, c)) =>
      d.withColumn(out, max(when(pred, c)).over(w))
    }
  }

  /** C4 (Field Control.R:226-241; all coverages.R:171-180): the
    * self-join formulation of the distinguished-row attach — join the
    * table to its own filtered projection. Kept alongside
    * [[attachAnchor]] because at scale a broadcastable anchor table
    * (one row per group) beats a full-width window shuffle.
    */
  def attachAnchorJoin(keys: Seq[String], pred: Column, cols: Map[String, Column])(df: DataFrame): DataFrame = {
    val anchor = df.filter(pred)
      .select(keys.map(col) ++ cols.map { case (out, c) => c.as(out) }.toSeq: _*)
    df.join(anchor, keys, "left")
  }

  /** D4 (all coverages.R:313-315): per-group mode with a pinned
    * deterministic tie-break (highest count, then greatest value —
    * SURVEY.md quirk D4: R's `tail(names(sort(table(x))),1)` tie-break
    * is locale-dependent, so we pin ours explicitly).
    */
  def modeByGroup(keys: Seq[String], valueCol: String, out: String)(df: DataFrame): DataFrame = {
    val counted = df.groupBy((keys :+ valueCol).map(col): _*).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__cnt").desc, col(valueCol).desc)
    counted.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(keys.map(col) :+ col(valueCol).as(out): _*)
  }

  /** E1/E5/F2 (Field Control.R:13-15; all coverages.R:288-290): top-k
    * rows per group by `order` (ties broken by `tieBreak` so results are
    * deterministic for the oracle).
    */
  def topKPerGroup(keys: Seq[String], order: Seq[Column], k: Int)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** H1 (all coverages.R:186-188, 288-294): multi-measure wide pivot with
    * `{measure}_{name}` column naming and zero-fill, matching
    * `pivot_wider(names_from, values_from, values_fill = 0)`. Pivot
    * values are pinned (no global distinct scan) and collisions resolve
    * by `min_by(measure, orderCol)` — quirk Q5's silent list-columns
    * become an explicit pinned choice that stays deterministic across
    * shuffles and partition counts (`first()` would not: it takes
    * partition processing order).
    */
  def pivotWide(keys: Seq[String], nameCol: String, names: Seq[String],
                measures: Seq[String], orderCol: String = "nflId")(df: DataFrame): DataFrame = {
    val aggCols = measures.map(m => min_by(col(m), col(orderCol)).as(m))
    val pivoted = df.groupBy(keys.map(col): _*)
      .pivot(nameCol, names)
      .agg(aggCols.head, aggCols.tail: _*)
    // Spark names pivot columns "{value}_{aggAlias}" (one measure: just
    // "{value}"); rename to "{measure}_{value}" for reference parity.
    val renamed = names.flatMap { v =>
      measures.map { m =>
        val sparkName = if (measures.size == 1) v else s"${v}_$m"
        sparkName -> s"${m}_$v"
      }
    }
    val out = renamed.foldLeft(pivoted) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    out.na.fill(0.0, renamed.map(_._2).filter(out.columns.contains))
  }
}
