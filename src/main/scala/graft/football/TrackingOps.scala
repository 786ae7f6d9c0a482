package graft.football

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tracking-series operators beyond the reference's verbs: the 10 Hz
  * frame stream (FIXTURES.md §2.4) upsampled/derived with window +
  * generator ops — no driver loops, partition-parallel per
  * (gameId, playId, nflId) timeline.
  */
object TrackingOps {

  private def timeline = Window.partitionBy("gameId", "playId", "nflId").orderBy("frameId")

  /** Linear position interpolation to `factor`× frame rate: each
    * consecutive frame pair fans out `factor` sub-frames via
    * sequence+explode (a generator, SURVEY.md §2.L: grid-style fan-out
    * beats per-row loops). The last frame of each timeline is kept
    * as-is. Output key: (gameId, playId, nflId, subFrame) with
    * `subFrame = (frameId-1)*factor + i`.
    */
  def interpolateFrames(tracking: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val withNext = tracking
      .withColumn("next_x", lead(col("x"), 1).over(timeline))
      .withColumn("next_y", lead(col("y"), 1).over(timeline))
    val inner = withNext
      .filter(col("next_x").isNotNull)
      .withColumn("i", explode(sequence(lit(0), lit(factor - 1))))
    val interpolated = inner
      .withColumn("frac", col("i").cast("double") / factor)
      .withColumn("xi", col("x") + (col("next_x") - col("x")) * col("frac"))
      .withColumn("yi", col("y") + (col("next_y") - col("y")) * col("frac"))
      .withColumn("subFrame", (col("frameId") - 1) * factor + col("i"))
    val lastFrames = withNext
      .filter(col("next_x").isNull)
      .withColumn("xi", col("x"))
      .withColumn("yi", col("y"))
      .withColumn("subFrame", (col("frameId") - 1) * factor)
    interpolated.unionByName(lastFrames.withColumn("i", lit(0)).withColumn("frac", lit(0.0)))
      .select("gameId", "playId", "nflId", "displayName", "subFrame", "xi", "yi")
  }

  /** §1.1's grouped-sub-frame escape hatch, used where it is genuinely
    * warranted: longest consecutive run of strictly-increasing speed per
    * player-play — an inherently sequential scan a window can't express
    * cleanly. `Dataset.flatMapGroups` keeps it one shuffle on the group
    * key with a streamed (never materialized) group iterator; every
    * other operator in the engine stays relational (the preferred
    * rewrite, SURVEY.md §2.L).
    */
  def longestAccelStreak(tracking: DataFrame)(implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    tracking
      .select(col("gameId"), col("playId"), col("nflId"), col("frameId"), col("s"))
      .as[(Long, Long, Long, Int, Double)]
      .groupByKey { case (g, p, n, _, _) => (g, p, n) }
      .flatMapGroups { (key: (Long, Long, Long), rows: Iterator[(Long, Long, Long, Int, Double)]) =>
        val (g, p, n) = key
        val sorted = rows.toSeq.sortBy(_._4)
        var best = if (sorted.isEmpty) 0 else 1
        var cur = best
        sorted.sliding(2).foreach {
          case Seq(a, b) =>
            cur = if (b._5 > a._5) cur + 1 else 1
            if (cur > best) best = cur
          case _ =>
        }
        Iterator.single((g, p, n, best))
      }
      .toDF("gameId", "playId", "nflId", "longest_accel_streak")
  }

  /** Derived per-frame speed from positions (yd/s at `hz` frames/sec) —
    * the inverse of the kinematics projection; useful to validate or
    * replace a noisy sensor `s` column.
    */
  def derivedSpeed(tracking: DataFrame, hz: Double = 10.0): DataFrame =
    tracking
      .withColumn("prev_x", lag(col("x"), 1).over(timeline))
      .withColumn("prev_y", lag(col("y"), 1).over(timeline))
      .withColumn("derived_s",
        when(col("prev_x").isNull, lit(null))
          .otherwise(graft.ops.Kinematics.dist(col("x"), col("y"), col("prev_x"), col("prev_y")) * hz))
      .drop("prev_x", "prev_y")
}
