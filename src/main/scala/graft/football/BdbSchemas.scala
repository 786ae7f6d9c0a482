package graft.football

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.TextSources

/** Explicit schemas + loaders for the Big Data Bowl 2021 CSV inputs the
  * reference reads (FIXTURES.md §2; Tutorial.R:11-20, all
  * coverages.R:19-28, 156-157). Explicit `StructType`s instead of
  * inference (SURVEY.md §1.3): one less full scan, self-documenting, and
  * stable under malformed rows. The 17 weekly tracking files load as ONE
  * glob scan — the distributed form of the reference's `bind_rows` loop
  * (A3) — so partition count follows file splits, not the loop.
  */
object BdbSchemas {

  val games: StructType = StructType(Seq(
    StructField("gameId", LongType),
    StructField("gameDate", StringType),
    StructField("gameTimeEastern", StringType),
    StructField("homeTeamAbbr", StringType),
    StructField("visitorTeamAbbr", StringType),
    StructField("week", IntegerType)))

  val players: StructType = StructType(Seq(
    StructField("nflId", LongType),
    StructField("height", StringType),
    StructField("weight", IntegerType),
    StructField("birthDate", StringType),
    StructField("collegeName", StringType),
    StructField("position", StringType),
    StructField("displayName", StringType)))

  val plays: StructType = StructType(Seq(
    StructField("gameId", LongType),
    StructField("playId", LongType),
    StructField("playDescription", StringType),
    StructField("quarter", IntegerType),
    StructField("down", IntegerType),
    StructField("yardsToGo", IntegerType),
    StructField("possessionTeam", StringType),
    StructField("playType", StringType),
    StructField("yardlineSide", StringType),
    StructField("yardlineNumber", IntegerType),
    StructField("offenseFormation", StringType),
    StructField("personnelO", StringType),
    StructField("defendersInTheBox", IntegerType),
    StructField("numberOfPassRushers", IntegerType),
    StructField("personnelD", StringType),
    StructField("typeDropback", StringType),
    StructField("preSnapVisitorScore", IntegerType),
    StructField("preSnapHomeScore", IntegerType),
    StructField("gameClock", StringType),
    StructField("absoluteYardlineNumber", IntegerType),
    StructField("penaltyCodes", StringType),
    StructField("penaltyJerseyNumbers", StringType),
    StructField("passResult", StringType),
    StructField("offensePlayResult", IntegerType),
    StructField("playResult", IntegerType),
    StructField("epa", DoubleType),
    StructField("isDefensivePI", BooleanType)))

  val tracking: StructType = StructType(Seq(
    StructField("time", StringType),
    StructField("x", DoubleType),
    StructField("y", DoubleType),
    StructField("s", DoubleType),
    StructField("a", DoubleType),
    StructField("dis", DoubleType),
    StructField("o", DoubleType),
    StructField("dir", DoubleType),
    StructField("event", StringType),
    StructField("nflId", LongType),
    StructField("displayName", StringType),
    StructField("jerseyNumber", IntegerType),
    StructField("position", StringType),
    StructField("frameId", IntegerType),
    StructField("team", StringType),
    StructField("gameId", LongType),
    StructField("playId", LongType),
    StructField("playDirection", StringType),
    StructField("route", StringType)))

  val coverages: StructType = StructType(Seq(
    StructField("gameId", LongType),
    StructField("playId", LongType),
    StructField("coverage", StringType)))

  def loadGames(spark: SparkSession, path: String): DataFrame =
    TextSources.csv(spark, games, path)
  def loadPlayers(spark: SparkSession, path: String): DataFrame =
    TextSources.csv(spark, players, path)
  def loadPlays(spark: SparkSession, path: String): DataFrame =
    TextSources.csv(spark, plays, path)
  /** All weekly files in one scan: pass a glob like `week*.csv` (A3). */
  def loadTracking(spark: SparkSession, glob: String): DataFrame =
    TextSources.csvGlob(spark, tracking, glob)
  def loadCoverages(spark: SparkSession, path: String): DataFrame =
    TextSources.csv(spark, coverages, path)
}
