package graft.football

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{FootballFixtures, TestSpark}

class CoveragePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val enriched = CoveragePipeline.enrich(
    FootballFixtures.tracking(spark),
    FootballFixtures.plays(spark),
    FootballFixtures.games(spark))

  test("enrich derives sideOfBall and defensiveTeam (§3.1 stages 2-5)") {
    // play (1,10): DET possesses, DET is home → home players = offense
    val rows = enriched.filter(col("playId") === 10 && col("frameId") === 1)
      .select("team", "sideOfBall", "defensiveTeam").collect()
    rows.foreach { r =>
      r.getString(0) match {
        case "home"     => assert(r.getString(1) === "offense")
        case "away"     => assert(r.getString(1) === "defense")
        case "football" => assert(r.getString(1) === "football")
      }
      assert(r.getString(2) === "CHI") // DET possesses → CHI defends
    }
  }

  test("withBall drops football-less frames and attaches standardized ball coords (§3.1 stages 7-8)") {
    val wb = CoveragePipeline.withBall(enriched)
    // frame 2 of play (1,10) has no football row → dropped
    assert(wb.filter(col("playId") === 10 && col("frameId") === 2).count() === 0)
    // frame 1 ball at raw (98,22), play is "left" → standardized (22, 160/3-22)
    val r = wb.filter(col("playId") === 10 && col("frameId") === 1 && col("nflId") === 101)
      .select("xFootball", "yFootball").head()
    assert(math.abs(r.getDouble(0) - 22.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - (160.0 / 3 - 22.0)) < 1e-12)
  }

  test("distanceAtArrival keeps only arrival events and computes ball distance (§3.1 stages 9-10)") {
    val d = CoveragePipeline.distanceAtArrival(CoveragePipeline.withBall(enriched))
    val evs = d.select("event").distinct().collect().map(_.getString(0)).toSet
    assert(evs.subsetOf(CoveragePipeline.PassArrivalEvents.toSet))
    // player 101 frame 3: std coords p=(120-97, 160/3-20), ball=(120-96.5, 160/3-22.5)
    val r = d.filter(col("nflId") === 101).select("distToFootball").head().getDouble(0)
    val expected = math.sqrt(math.pow(97.0 - 96.5, 2) + math.pow(20.0 - 22.5, 2)) // flips cancel in the delta
    assert(math.abs(r - expected) < 1e-12)
  }

  test("distanceAtArrival(firstArrivalOnly) keeps only each play's first arrival frame (E4)") {
    import spark.implicits._
    // two arrival frames per play — the disabled-in-reference E4 variant
    // must keep only the earliest (Tutorial.R:194-195)
    val df = Seq(
      (1L, 10L, 4, "pass_arrived", 10.0, 10.0, 11.0, 11.0),
      (1L, 10L, 6, "pass_outcome_caught", 12.0, 10.0, 12.5, 11.0),
      (1L, 20L, 9, "pass_arrived", 20.0, 5.0, 21.0, 6.0),
      (1L, 20L, 2, "ball_snap", 19.0, 5.0, 20.0, 6.0)
    ).toDF("gameId", "playId", "frameId", "event", "x", "y", "xFootball", "yFootball")
    val out = CoveragePipeline.distanceAtArrival(df, firstArrivalOnly = true)
    val frames = out.select("playId", "frameId").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(frames === Set((10L, 4), (20L, 9)))
    assert(out.columns.contains("distToFootball") && !out.columns.contains("minArrivalFrame"))
  }

  test("selectPlay returns None when fewer than k plays match (F2 slice semantics)") {
    assert(CoveragePipeline.selectPlay(FootballFixtures.plays(spark), ".", 99).isEmpty)
    assert(CoveragePipeline.selectPlay(FootballFixtures.plays(spark), "no_such_play", 1).isEmpty)
  }

  test("withLineOfScrimmage attaches frame-1 ball x per play (§3.3 stage 1, Q2 scope)") {
    val std = CoveragePipeline.withBall(enriched)
    val withLos = CoveragePipeline.withLineOfScrimmage(std)
    val los10 = withLos.filter(col("playId") === 10).select("los").distinct().collect()
    assert(los10.length === 1)
    assert(math.abs(los10.head.getDouble(0) - 22.0) < 1e-12) // standardized frame-1 ball x
  }

  test("selectPlay pulls the k-th biggest matching play as driver scalars (F2/F5)") {
    val play = CoveragePipeline.selectPlay(FootballFixtures.plays(spark), ".", 2)
    assert(play.isDefined)
    // all plays match; results 30, 12, 3 → 2nd biggest is 12
    assert(play.get.getAs[Int]("offensePlayResult") === 12)
  }

  test("withPersonnel parses the N DL, N LB, N DB layout (§3.3 stage 2)") {
    val p = CoveragePipeline.withPersonnel(FootballFixtures.plays(spark))
      .filter(col("playId") === 10).select("n_dl", "n_lb", "n_db").head()
    assert(p.getDouble(0) === 4.0 && p.getDouble(1) === 2.0 && p.getDouble(2) === 5.0)
  }

  test("playCoverage takes the per-play mode of frame predictions; coverageSummary computes n/epa/freq (§3.3 stages 10-11)") {
    import spark.implicits._
    val frames = Seq(
      (1L, 10L, 1, "Cover 1 Man"), (1L, 10L, 2, "Cover 1 Man"), (1L, 10L, 3, "Cover 3 Zone"),
      (1L, 20L, 1, "Cover 3 Zone")
    ).toDF("gameId", "playId", "frameId", "predicted_coverage")
    val perPlay = CoveragePipeline.playCoverage(frames)
    val m = perPlay.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(m((1L, 10L)) === "Cover 1 Man") // 2-vs-1 mode
    assert(m((1L, 20L)) === "Cover 3 Zone")
    val withEpa = perPlay.join(
      FootballFixtures.plays(spark).select("gameId", "playId", "epa"), Seq("gameId", "playId"))
    val summary = CoveragePipeline.coverageSummary(withEpa).collect()
    assert(summary.map(_.getString(0)).toSeq.sorted === Seq("Cover 1 Man", "Cover 3 Zone"))
    // freq sums to 1, epa averaged null-skipping
    assert(math.abs(summary.map(_.getAs[Double]("freq")).sum - 1.0) < 1e-12)
  }

  test("coverageFeatureMatrix pivots defenders wide with zero fill (§3.3 stages 4-6)") {
    val m = CoveragePipeline.coverageFeatureMatrix(
      CoveragePipeline.withLineOfScrimmage(enriched))
    // one pass_arrived frame with defenders: play (1,10) frame 3
    assert(m.count() === 1)
    val row = m.head()
    assert(row.getAs[Long]("playId") === 10L && row.getAs[Int]("frameId") === 3)
    // 3 key cols + 8 measures × 7 positions
    assert(m.columns.length === 3 + 8 * 7)
    // absent positions zero-filled
    assert(row.getAs[Double]("s_SS") === 0.0)
    // present CB resolves deterministically (lowest nflId = 101, s=5.5)
    assert(row.getAs[Double]("s_CB") === 5.5)
  }
}
