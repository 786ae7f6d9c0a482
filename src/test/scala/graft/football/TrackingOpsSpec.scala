package graft.football

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrackingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def straightLine = {
    import spark.implicits._
    // one player moving (0,0) → (4,2) → (8,4): constant velocity
    Seq(
      (1L, 1L, 7L, "P", 1, 0.0, 0.0),
      (1L, 1L, 7L, "P", 2, 4.0, 2.0),
      (1L, 1L, 7L, "P", 3, 8.0, 4.0)
    ).toDF("gameId", "playId", "nflId", "displayName", "frameId", "x", "y")
  }

  test("interpolateFrames doubles the frame rate with exact midpoints") {
    val up = TrackingOps.interpolateFrames(straightLine, factor = 2)
    // 2 inner frames × 2 + final frame = 5 sub-frames
    assert(up.count() === 5)
    val byFrame = up.collect().map(r => r.getAs[Int]("subFrame") ->
      (r.getAs[Double]("xi"), r.getAs[Double]("yi"))).toMap
    assert(byFrame(0) === ((0.0, 0.0)))
    assert(byFrame(1) === ((2.0, 1.0))) // exact midpoint
    assert(byFrame(2) === ((4.0, 2.0)))
    assert(byFrame(3) === ((6.0, 3.0)))
    assert(byFrame(4) === ((8.0, 4.0)))
  }

  test("interpolateFrames with factor=1 preserves the original frames") {
    val up = TrackingOps.interpolateFrames(straightLine, factor = 1)
    assert(up.count() === 3)
    assert(up.select(sum(col("xi"))).head().getDouble(0) === 12.0)
  }

  test("longestAccelStreak finds the longest increasing run (gaps-and-islands windows)") {
    import spark.implicits._
    implicit val s = spark
    // speeds: 1,2,3,1,2 → longest increasing run = 3
    val df = Seq(
      (1L, 1L, 7L, "P", 1, 0.0, 0.0, 1.0),
      (1L, 1L, 7L, "P", 2, 1.0, 0.0, 2.0),
      (1L, 1L, 7L, "P", 3, 2.0, 0.0, 3.0),
      (1L, 1L, 7L, "P", 4, 3.0, 0.0, 1.0),
      (1L, 1L, 7L, "P", 5, 4.0, 0.0, 2.0),
      (1L, 1L, 8L, "Q", 1, 0.0, 0.0, 5.0)
    ).toDF("gameId", "playId", "nflId", "displayName", "frameId", "x", "y", "s")
    val streaks = TrackingOps.longestAccelStreak(df)
      .collect().map(r => r.getLong(2) -> r.getInt(3)).toMap
    assert(streaks(7L) === 3)
    assert(streaks(8L) === 1)
    val scanned = TrackingOps.longestAccelStreakScan(df)
      .collect().map(r => r.getLong(2) -> r.getInt(3)).toMap
    assert(scanned === streaks)
  }

  test("windows and secondary-sort streak forms match brute force on large shuffled timelines") {
    import spark.implicits._
    implicit val s = spark
    // 50k-frame timelines (far beyond any real play) in SHUFFLED input
    // order across many partitions: the secondary sort must restore the
    // frame order per group without materializing a timeline in memory
    val rnd = new scala.util.Random(7)
    val raw = (1 to 3).flatMap { player =>
      (1 to 50000).map { f => (1L, 1L, player.toLong, "P", f, 0.0, 0.0, rnd.nextDouble()) }
    }
    val expected = raw.groupBy(_._3).map { case (n, rows) =>
      val speeds = rows.sortBy(_._5).map(_._8)
      var best = 1; var run = 1
      speeds.sliding(2).foreach {
        case Seq(a, b) => run = if (b > a) run + 1 else 1; if (run > best) best = run
        case _ =>
      }
      n -> best
    }
    val df = rnd.shuffle(raw)
      .toDF("gameId", "playId", "nflId", "displayName", "frameId", "x", "y", "s")
      .repartition(16) // scatter each timeline over many input partitions
    val got = TrackingOps.longestAccelStreak(df)
      .collect().map(r => r.getLong(2) -> r.getInt(3)).toMap
    assert(got === expected)
    val gotScan = TrackingOps.longestAccelStreakScan(df)
      .collect().map(r => r.getLong(2) -> r.getInt(3)).toMap
    assert(gotScan === expected)
  }

  test("derivedSpeed recovers constant velocity from positions") {
    val d = TrackingOps.derivedSpeed(straightLine, hz = 10.0)
    val speeds = d.filter(col("derived_s").isNotNull)
      .select("derived_s").collect().map(_.getDouble(0))
    // step length = sqrt(16+4) = 4.472 yd per frame → 44.72 yd/s at 10 Hz
    assert(speeds.length === 2)
    speeds.foreach(s => assert(math.abs(s - math.sqrt(20.0) * 10) < 1e-9))
  }
}
