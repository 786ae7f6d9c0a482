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

  test("normalizeByGridMax equals the reference's dmvnorm/grid-max formula (Field Control.R:346-347)") {
    import spark.implicits._
    // Two players (different μ/Σ/θ) over one 8×6 grid whose cells do NOT
    // contain either μ — the case where the discrete form differs from
    // the continuous default.
    val players = Seq((1L, 10.3, 9.7, 0.4, 3.0, 1.5), (2L, 4.1, 12.9, 1.1, 2.0, 0.5))
    val grid = for (i <- 0 until 8; j <- 0 until 6) yield (i * 1.7, j * 2.3)
    val fanout = players.toDF("nflId", "mu_x", "mu_y", "theta", "sx", "sy")
      .crossJoin(grid.toDF("grid_x", "grid_y"))
      .withColumn("influence", FieldControl.gaussianInfluence(
        col("grid_x"), col("grid_y"), col("mu_x"), col("mu_y"),
        col("theta"), col("sx"), col("sy")))
    val got = FieldControl.normalizeByGridMax(Seq("nflId"))(fanout)
      .select("nflId", "grid_x", "grid_y", "influence")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    // reference formula, computed independently: full dmvnorm density
    // (constant 1/(2π√det) included) divided by its max over the grid
    def dmvnorm(gx: Double, gy: Double, muX: Double, muY: Double,
                theta: Double, sx: Double, sy: Double): Double = {
      val (c, s) = (math.cos(theta), math.sin(theta))
      val (sx2, sy2) = (sx * sx, sy * sy)
      val (s11, s22, s12) = (sx2 * c * c + sy2 * s * s, sx2 * s * s + sy2 * c * c, (sx2 - sy2) * s * c)
      val det = sx2 * sy2
      val (dx, dy) = (gx - muX, gy - muY)
      math.exp(-0.5 * (s22 * dx * dx - 2 * s12 * dx * dy + s11 * dy * dy) / det) /
        (2 * math.Pi * math.sqrt(det))
    }
    players.foreach { case (id, muX, muY, theta, sx, sy) =>
      val dens = grid.map { case (gx, gy) => (gx, gy) -> dmvnorm(gx, gy, muX, muY, theta, sx, sy) }
      val mx = dens.map(_._2).max
      dens.foreach { case ((gx, gy), d) =>
        assert(math.abs(got((id, gx, gy)) - d / mx) < 1e-12,
          s"player $id cell ($gx,$gy)")
      }
      // the reference property: every player's grid max normalizes to exactly 1
      assert(math.abs(grid.map { case (gx, gy) => got((id, gx, gy)) }.max - 1.0) < 1e-12)
    }
  }

  test("playControl gridNormalize changes absolute control only via the per-player grid-max factor") {
    val keys = Seq("gameId", "playId", "frameId", "grid_x", "grid_y")
    val base = graft.football.FieldControlPipeline.playControl(
      spark, graft.FootballFixtures.tracking(spark), nx = 12, ny = 6)
      .select((keys :+ "control").map(col): _*)
    val gridNorm = graft.football.FieldControlPipeline.playControl(
      spark, graft.FootballFixtures.tracking(spark), nx = 12, ny = 6, gridNormalize = true)
      .select((keys :+ "control").map(col): _*)
    assert(gridNorm.count() === base.count())
    val vals = gridNorm.select("control").collect().map(_.getDouble(0))
    assert(vals.forall(v => v > 0.0 && v < 1.0))
    // grid-max normalization scales each player's influence UP by ≥1
    // (discrete max ≤ continuous max), pushing every |control_sum| up:
    // cells keep their side of 0.5 — ordering semantics are unchanged
    val joined = base.withColumnRenamed("control", "c0")
      .join(gridNorm.withColumnRenamed("control", "c1"), keys)
    val crossed = joined.filter(
      (col("c0") - 0.5) * (col("c1") - 0.5) < -1e-12).count()
    assert(crossed === 0, s"$crossed cells switched dominance under gridNormalize")
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
