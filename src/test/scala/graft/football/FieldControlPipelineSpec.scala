package graft.football

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{FootballFixtures, TestSpark}

class FieldControlPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("playControl produces a per-frame control surface over the full grid (§3.2)") {
    val ctl = FieldControlPipeline.playControl(
      spark, FootballFixtures.tracking(spark), nx = 12, ny = 6)
    // frames with a football row: (1,10,f1), (1,10,f3), (1,20,f1) → 3 frames × 72 cells
    assert(ctl.count() === 3 * 72)
    val vals = ctl.select("control").collect().map(_.getDouble(0))
    assert(vals.forall(v => v > 0.0 && v < 1.0))
    // near the lone home player in play (1,20) frame 1, home should dominate:
    // home flips to sgn=−1 (Field Control.R:363-367), so
    // control = 1/(1+exp(sum)) with sum<0 → control>0.5 (home control → 1)
    val nearHome = ctl.filter(col("playId") === 20 && col("frameId") === 1)
      .withColumn("d", graft.ops.Kinematics.dist(col("grid_x"), col("grid_y"), lit(40.0), lit(30.0)))
      .orderBy("d").select("control").head().getDouble(0)
    assert(nearHome > 0.5)
  }

  test("mahalanobis pruning leaves the control surface unchanged at the safe cutoff") {
    val keys = Seq("gameId", "playId", "frameId", "grid_x", "grid_y")
    val unpruned = FieldControlPipeline.playControl(
      spark, FootballFixtures.tracking(spark), nx = 12, ny = 6, pruneMahalanobis = None)
      .select((keys :+ "control").map(col): _*)
    val pruned = FieldControlPipeline.playControl(
      spark, FootballFixtures.tracking(spark), nx = 12, ny = 6, pruneMahalanobis = Some(12.0))
      .select((keys :+ "control").map(col): _*)
    assert(pruned.count() === unpruned.count()) // shape preserved incl. empty cells
    val joined = unpruned.withColumnRenamed("control", "c0")
      .join(pruned.withColumnRenamed("control", "c1"), keys)
    val maxDiff = joined
      .select(max(abs(col("c0") - col("c1")))).head().getDouble(0)
    assert(maxDiff < 1e-9, s"pruning moved results by $maxDiff")
  }

  test("playControl is partition-parallel: no collect, single aggregation exchange per surface") {
    val ctl = FieldControlPipeline.playControl(
      spark, FootballFixtures.tracking(spark), nx = 12, ny = 6)
    val plan = ctl.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin")) // grid broadcast
    assert(plan.contains("partial_sum"))             // map-side combine before the cell shuffle
  }
}
