package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FieldControlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("fieldGrid generates nx*ny cells spanning the field (C6)") {
    val g = FieldControl.fieldGrid(spark, 12, 6).collect()
    assert(g.length === 72)
    val xs = g.map(_.getDouble(0))
    val ys = g.map(_.getDouble(1))
    assert(xs.min === 0.0 && xs.max === 120.0 - 120.0 / 12)
    assert(ys.min === 0.0 && ys.max < 160.0 / 3)
  }

  test("gaussian influence is 1 at the mean and decays with distance (I11)") {
    import spark.implicits._
    val df = Seq(
      (10.0, 10.0), // at mean
      (12.0, 10.0), // 2 yd away
      (20.0, 10.0)  // 10 yd away
    ).toDF("gx", "gy")
      .select(FieldControl.gaussianInfluence(
        col("gx"), col("gy"), lit(10.0), lit(10.0),
        lit(0.3), lit(4.0), lit(2.0)).as("infl"))
      .collect().map(_.getDouble(0))
    assert(math.abs(df(0) - 1.0) < 1e-12)
    assert(df(0) > df(1) && df(1) > df(2))
    assert(df.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("gaussian influence matches hand-computed closed form for a known case") {
    // θ=0 → axis-aligned: Σ = diag(sx², sy²); density/max =
    // exp(-0.5*(dx²/sx² + dy²/sy²)). Check dx=3, dy=1, sx=2, sy=1.
    import spark.implicits._
    val got = Seq((13.0, 11.0)).toDF("gx", "gy")
      .select(FieldControl.gaussianInfluence(
        col("gx"), col("gy"), lit(10.0), lit(10.0),
        lit(0.0), lit(2.0), lit(1.0)).as("i"))
      .head().getDouble(0)
    val expected = math.exp(-0.5 * (9.0 / 4.0 + 1.0 / 1.0))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("gaussian influence is rotation-consistent: rotating the query point by θ matches axis-aligned") {
    import spark.implicits._
    val theta = 0.7
    // point at distance 3 along the major axis, rotated into place
    val gx = 10.0 + 3.0 * math.cos(theta)
    val gy = 10.0 + 3.0 * math.sin(theta)
    val got = Seq((gx, gy)).toDF("gx", "gy")
      .select(FieldControl.gaussianInfluence(
        col("gx"), col("gy"), lit(10.0), lit(10.0),
        lit(theta), lit(2.0), lit(1.0)).as("i"))
      .head().getDouble(0)
    val expected = math.exp(-0.5 * (9.0 / 4.0)) // purely major-axis offset
    assert(math.abs(got - expected) < 1e-9)
  }

  test("teamControl sums signed influence and sigmoids into (0,1); sign-swap flips around 0.5 (D3/I5/B3)") {
    import spark.implicits._
    val df = Seq(
      (0.0, 0.0, 0.8, 1.0), (0.0, 0.0, 0.5, -1.0),
      (5.0, 0.0, 0.9, -1.0)).toDF("grid_x", "grid_y", "influence", "sgn")
    val ctl = FieldControl.teamControl(Seq("grid_x", "grid_y"), col("influence"), col("sgn"))(df)
      .collect().map(r => (r.getDouble(0), r.getAs[Double]("control"))).toMap
    assert(math.abs(ctl(0.0) - 1.0 / (1.0 + math.exp(0.3))) < 1e-12)
    assert(math.abs(ctl(5.0) - 1.0 / (1.0 + math.exp(-0.9))) < 1e-12)
    // antisymmetry: flipping all signs maps control → 1 - control
    val flipped = FieldControl.teamControl(Seq("grid_x", "grid_y"), col("influence"), -col("sgn"))(df)
      .collect().map(r => (r.getDouble(0), r.getAs[Double]("control"))).toMap
    ctl.foreach { case (k, v) => assert(math.abs(flipped(k) - (1.0 - v)) < 1e-12) }
  }
}
