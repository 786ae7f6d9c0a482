package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.{FootballFixtures, TestSpark}

class StandardizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("left plays mirror both axes; right plays unchanged (B1, applied ONCE — quirk Q1)") {
    val std = Standardize.directionStandardize(FootballFixtures.tracking(spark))
    // left play (1,10): ball row frame 1 was (98, 22) → (22, 31.333…)
    val ball = std.filter(col("playId") === 10 && col("frameId") === 1 && col("displayName") === "Football")
      .select("x", "y").head()
    assert(math.abs(ball.getDouble(0) - 22.0) < 1e-12)
    assert(math.abs(ball.getDouble(1) - (160.0 / 3 - 22.0)) < 1e-12)
    // right play (1,20): unchanged
    val lb = std.filter(col("playId") === 20 && col("nflId") === 104).select("x", "y").head()
    assert(lb.getDouble(0) === 40.0 && lb.getDouble(1) === 30.0)
  }

  test("standardization applied twice un-flips left plays — the Q1 bug, encoded (property)") {
    import spark.implicits._
    val gen = for {
      x <- Gen.choose(0.0, 120.0)
      y <- Gen.choose(0.0, 160.0 / 3)
    } yield (x, y)
    val prop = Prop.forAll(gen) { case (x, y) =>
      val once = Seq(("left", x, y)).toDF("playDirection", "x", "y")
      val flipped = Standardize.directionStandardize(once)
      val twice = Standardize.directionStandardize(flipped)
      val r1 = flipped.select("x", "y").head()
      val r2 = twice.select("x", "y").head()
      // involution: flip∘flip = id (so the reference's double application
      // silently restores raw coords — we must apply exactly once)
      math.abs(r2.getDouble(0) - x) < 1e-9 && math.abs(r2.getDouble(1) - y) < 1e-9 &&
        (math.abs(r1.getDouble(0) - (120.0 - x)) < 1e-9)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }
}
