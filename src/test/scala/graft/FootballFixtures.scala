package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tiny in-memory football-shaped fixtures mirroring the reference's
  * input tables (FIXTURES.md §2) — only the columns its code touches.
  * Deterministic; includes the invariants §2.7 requires: a mix of
  * left/right plays, a frame missing the football row, multiple players
  * per position in one frame, and a `pass_arrived` event.
  */
object FootballFixtures {

  case class Tracking(
      gameId: Long, playId: Long, frameId: Int, nflId: java.lang.Long,
      displayName: String, team: String, position: String,
      playDirection: String, x: Double, y: Double,
      s: Double, a: Double, dis: Double, o: Double, dir: Double,
      event: String)

  case class Play(
      gameId: Long, playId: Long, playDescription: String,
      possessionTeam: String, offensePlayResult: Int,
      absoluteYardlineNumber: Int, yardsToGo: Int, down: Int,
      defendersInTheBox: Int, numberOfPassRushers: Int,
      personnelD: String, epa: java.lang.Double)

  case class Game(gameId: Long, homeTeamAbbr: String, visitorTeamAbbr: String)

  case class Coverage(gameId: Long, playId: Long, coverage: String)

  def games(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      Game(1L, "DET", "CHI"),
      Game(2L, "GB", "DET")).toDF()
  }

  def plays(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      Play(1L, 10L, "(14:10) M.Stafford pass deep right", "DET", 30, 45, 10, 1, 6, 4, "4 DL, 2 LB, 5 DB", 0.8),
      Play(1L, 20L, "(13:01) run up the middle", "CHI", 3, 60, 7, 2, 7, 4, "3 DL, 3 LB, 5 DB", -0.4),
      Play(2L, 10L, "(02:00) A.Rodgers short left", "GB", 12, 25, 3, 3, 5, 5, "2 DL, 4 LB, 5 DB", null)).toDF()
  }

  /** Two plays; play (1,10) is direction "left" (exercises B1/Q1), play
    * (1,20) is "right". Frame 1 of (1,10) has a Football row; frame 2
    * does NOT (B14 branch). Frame 3 has the pass_arrived event and two
    * players sharing position CB (H1/Q5 collision).
    */
  def tracking(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // play (1,10), left — frame 1 (with football)
      Tracking(1L, 10L, 1, 101L, "A Corner", "away", "CB", "left", 100.0, 20.0, 5.0, 1.0, 0.5, 90.0, 90.0, null),
      Tracking(1L, 10L, 1, 102L, "B Safety", "away", "FS", "left", 95.0, 25.0, 4.0, 0.5, 0.4, 180.0, 0.0, null),
      Tracking(1L, 10L, 1, 201L, "C Receiver", "home", "WR", "left", 99.0, 21.0, 6.0, 1.2, 0.6, 45.0, 270.0, null),
      Tracking(1L, 10L, 1, null, "Football", "football", null, "left", 98.0, 22.0, 10.0, 0.0, 1.0, 0.0, 0.0, null),
      // frame 2 — football missing (B14: footballInPlay = false)
      Tracking(1L, 10L, 2, 101L, "A Corner", "away", "CB", "left", 99.0, 20.5, 5.2, 1.0, 0.5, 90.0, 90.0, null),
      Tracking(1L, 10L, 2, 102L, "B Safety", "away", "FS", "left", 94.0, 24.5, 4.1, 0.5, 0.4, 180.0, 0.0, null),
      // frame 3 — pass_arrived; two CBs in one frame (Q5 collision)
      Tracking(1L, 10L, 3, 101L, "A Corner", "away", "CB", "left", 97.0, 20.0, 5.5, 1.0, 0.5, 90.0, 180.0, "pass_arrived"),
      Tracking(1L, 10L, 3, 103L, "D Corner", "away", "CB", "left", 96.0, 26.0, 3.0, 0.8, 0.3, 45.0, 45.0, "pass_arrived"),
      Tracking(1L, 10L, 3, null, "Football", "football", null, "left", 96.5, 22.5, 12.0, 0.0, 1.2, 0.0, 0.0, "pass_arrived"),
      // play (1,20), right — one frame with football
      Tracking(1L, 20L, 1, 104L, "E Backer", "home", "LB", "right", 40.0, 30.0, 2.0, 0.2, 0.2, 0.0, 0.0, null),
      Tracking(1L, 20L, 1, null, "Football", "football", null, "right", 42.0, 28.0, 8.0, 0.0, 0.8, 0.0, 90.0, "ball_snap")
    ).toDF()
  }

  def coverages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      Coverage(1L, 10L, "Cover 1 Man"),
      Coverage(1L, 20L, "Cover 3 Zone")).toDF()
  }
}
