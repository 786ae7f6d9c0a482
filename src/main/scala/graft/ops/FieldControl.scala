package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's spatial "field control" model (Field Control.R:223-378;
  * SURVEY.md §3.2): per player-frame, a bivariate-Gaussian zone of
  * influence evaluated over a dense field grid, summed per cell with a
  * team sign, squashed through a sigmoid.
  *
  * The reference computes Σ = R·S·S·R⁻¹ per row with `mvtnorm::dmvnorm`
  * in a *sequential* per-group loop (Field Control.R:360-378). Here the
  * whole model is closed-form `Column` arithmetic (SURVEY.md §7.4) over a
  * `crossJoin(broadcast(grid))` — fully codegen'd, partition-parallel
  * over players×frames, no UDFs. At 100 TB the grid side is a few KB
  * (always broadcast) and the fan-out is bounded: rows × cells, evenly
  * partitioned by the tracking side's keys.
  */
object FieldControl {

  /** C6 (Field Control.R:324-327): the evaluation grid as a DataFrame —
    * `nx × ny` cells over the 120 × 160/3 yd field. Generated
    * distributively (`spark.range` cross `spark.range`), never collected.
    */
  def fieldGrid(spark: SparkSession, nx: Int, ny: Int): DataFrame = {
    val xs = spark.range(nx.toLong).select((col("id") * lit(120.0 / nx)).as("grid_x"))
    val ys = spark.range(ny.toLong).select((col("id") * lit(160.0 / 3.0 / ny)).as("grid_y"))
    xs.crossJoin(ys)
  }

  /** I11 (Field Control.R:294-319 + 341-347), closed form. For rotation
    * R(θ) and scaling S(sx, sy): σ11 = sx²cos²θ + sy²sin²θ,
    * σ22 = sx²sin²θ + sy²cos²θ, σ12 = (sx²−sy²)·sinθ·cosθ,
    * det Σ = sx²·sy². Normalization: the reference divides each player's
    * density by its max over the DISCRETE grid (Field Control.R:346-347);
    * we normalize by the continuous maximum at μ — i.e. return
    * exp(−½·[σ22·dx² − 2σ12·dx·dy + σ11·dy²]/det) directly. The two
    * differ by a per-player factor of exp(+½·mahaSq(cell nearest μ))
    * (= 1 exactly when the grid contains μ): a deliberate, documented
    * deviation — the continuous form needs no second pass over the
    * fan-out (the reference's window-max is an extra O(rows×cells)
    * scan), and the per-cell ORDERING of influence is unchanged.
    */
  def gaussianInfluence(gx: Column, gy: Column, muX: Column, muY: Column,
                        theta: Column, sx: Column, sy: Column): Column =
    exp(lit(-0.5) * mahalanobisSq(gx, gy, muX, muY, theta, sx, sy))

  /** Squared Mahalanobis distance of (gx, gy) from the influence
    * ellipse — `influence = exp(-½·mahaSq)`. Exposed separately so
    * callers can prune far cells *before* the exp and the per-cell
    * aggregation: beyond maha ≈ 12σ the dropped mass (< e⁻⁷² per row)
    * cannot move any 6-decimal-rounded result, but at a full
    * 120×53-grid fan-out it removes the vast majority of aggregation
    * input (SURVEY.md §4, SCALING.md "Field control").
    */
  def mahalanobisSq(gx: Column, gy: Column, muX: Column, muY: Column,
                    theta: Column, sx: Column, sy: Column): Column = {
    val sx2 = sx * sx
    val sy2 = sy * sy
    val cosT = cos(theta)
    val sinT = sin(theta)
    val s11 = sx2 * cosT * cosT + sy2 * sinT * sinT
    val s22 = sx2 * sinT * sinT + sy2 * cosT * cosT
    val s12 = (sx2 - sy2) * sinT * cosT
    val det = sx2 * sy2
    val dx = gx - muX
    val dy = gy - muY
    (s22 * dx * dx - lit(2.0) * s12 * dx * dy + s11 * dy * dy) / det
  }

  /** Field Control.R:346-347 EXACTLY (E3): each player's influence
    * divided by its max over the evaluated DISCRETE grid — the
    * reference's normalization, selectable where parity with the
    * reference's absolute values matters. The constant density factor
    * 1/(2π√det) cancels in the division, so this equals
    * dmvnorm(cell)/max(dmvnorm over grid) exactly. Differs from the
    * default continuous form ([[gaussianInfluence]], which normalizes by
    * the density at μ) by a per-player factor of
    * exp(+½·min-over-grid maha²) — = 1 exactly when the grid contains μ.
    * Costs one window shuffle+scan over the rows×cells fan-out (the
    * reason the continuous form is the default).
    */
  def normalizeByGridMax(playerCols: Seq[String], influenceCol: String = "influence")(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(playerCols.map(col): _*)
    df.withColumn(influenceCol, col(influenceCol) / max(col(influenceCol)).over(w))
  }

  /** D3 + I5 + B3 sign flip (Field Control.R:357-373): team-signed sum of
    * influence per grid cell, squashed by the sigmoid
    * `control = 1 / (1 + exp(sum))`. `teamSign` is ±1 per input row.
    */
  def teamControl(groupCols: Seq[String], influence: Column, teamSign: Column)(df: DataFrame): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(influence * teamSign).as("control_sum"))
      .withColumn("control", lit(1.0) / (lit(1.0) + exp(col("control_sum"))))
}
