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
    // control = 1/(1+exp(sum)) with home sgn=+1 → sum>0 → control<0.5
    val nearHome = ctl.filter(col("playId") === 20 && col("frameId") === 1)
      .withColumn("d", graft.ops.Kinematics.dist(col("grid_x"), col("grid_y"), lit(40.0), lit(30.0)))
      .orderBy("d").select("control").head().getDouble(0)
    assert(nearHome < 0.5)
  }

  test("playControl is partition-parallel: no collect, single aggregation exchange per surface") {
    val ctl = FieldControlPipeline.playControl(
      spark, FootballFixtures.tracking(spark), nx = 12, ny = 6)
    val plan = ctl.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin")) // grid broadcast
    assert(plan.contains("partial_sum"))             // map-side combine before the cell shuffle
  }
}
