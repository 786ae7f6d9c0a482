package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KinematicsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def velo(dir: Double, s: Double): (Double, Double, Double) = {
    import spark.implicits._
    val r = Kinematics.withVelocity(Seq((dir, s)).toDF("dir", "s"))
      .select("v_x", "v_y", "v_theta").head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  test("velocity components match sin/cos decomposition (I3/I12, Field Control.R:33-35)") {
    val (vx, vy, _) = velo(90.0, 5.0)
    assert(math.abs(vx - 5.0) < 1e-12) // sin(90°)=1
    assert(math.abs(vy) < 1e-12)       // cos(90°)=0
  }

  test("v_theta 0/0 guard yields 0 (I4, Field Control.R:36-37)") {
    val (_, _, t) = velo(0.0, 0.0) // s=0 → v_x=v_y=0
    assert(t === 0.0)
  }

  test("v_theta y/0 yields ±π/2 (R atan(±Inf) semantics)") {
    val (_, _, t) = velo(0.0, 5.0) // dir=0 → v_x=0, v_y=5
    assert(math.abs(t - math.Pi / 2) < 1e-12)
    val (_, _, t2) = velo(180.0, 5.0) // v_x = sin(π)*5 ≈ 6e-16 ≠ 0 → plain atan branch
    assert(t2.abs <= math.Pi / 2)
  }

  test("radius of influence follows the cubic formula and clamps at 10 (I2/I6/Q8)") {
    import spark.implicits._
    val d = Seq(0.0, 1.0, 2.0, 5.0, 19.0).toDF("d")
      .select(Kinematics.radiusOfInfluence(col("d")).as("r"))
      .collect().map(_.getDouble(0))
    assert(d(0) === 4.0)                       // at ball
    assert(math.abs(d(1) - 4.3) < 1e-12)       // 4 + 1*0.3
    assert(math.abs(d(2) - (4 + 8 * 0.3)) < 1e-12)
    assert(d(3) === 10.0 && d(4) === 10.0)     // clamped (saturates ~2.7yd, Q8)
  }

  test("dist is symmetric and non-negative (I1 property)") {
    import spark.implicits._
    val pts = Seq((1.0, 2.0, 4.0, 6.0), (0.0, 0.0, 3.0, 4.0), (-2.0, 5.0, 7.0, -1.0))
    val rows = pts.toDF("x1", "y1", "x2", "y2")
      .select(
        Kinematics.dist(col("x1"), col("y1"), col("x2"), col("y2")).as("d12"),
        Kinematics.dist(col("x2"), col("y2"), col("x1"), col("y1")).as("d21"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(0) >= 0.0)
    }
    // known 3-4-5 triangle
    assert(rows(1).getDouble(0) === 5.0)
  }
}
