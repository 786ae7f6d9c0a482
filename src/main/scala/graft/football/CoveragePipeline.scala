package graft.football

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.ops.{Kinematics, RelationalOps, Standardize}

/** The reference's three entry-point pipelines (SURVEY.md §3) as
  * composable `DataFrame => DataFrame` stages over football-schema
  * frames (FIXTURES.md §2). Each stage is the Spark-first rewrite of the
  * corresponding dplyr block; quirks Q1/Q2/Q5/Q6 are pinned to intended
  * semantics (SURVEY.md §2.M).
  *
  * Scale posture: every window partitions by
  * (gameId, playId[, frameId]) — high-cardinality keys that shard evenly
  * at any scale; dims (games, plays) broadcast against the big tracking
  * table; no collect anywhere.
  */
object CoveragePipeline {

  val PassArrivalEvents: Seq[String] = Seq(
    "pass_outcome_caught", "pass_arrived", "pass_outcome_incomplete",
    "pass_outcome_interception", "pass_outcome_touchdown") // Tutorial.R:138-142

  private val frameKeys = Seq("gameId", "playId", "frameId")

  /** §3.1 stages 2-5 (Tutorial.R:125-166): standardize coords ONCE (Q1),
    * join games+plays dims (broadcast), derive sideOfBall/defensiveTeam.
    */
  def enrich(tracking: DataFrame, plays: DataFrame, games: DataFrame): DataFrame = {
    val std = Standardize.directionStandardize(tracking)
    std
      .join(broadcast(plays.join(broadcast(games), Seq("gameId"))), Seq("gameId", "playId"))
      .withColumn("sideOfBall",
        when((col("team") === "home" && col("possessionTeam") === col("homeTeamAbbr")) ||
             (col("team") === "away" && col("possessionTeam") === col("visitorTeamAbbr")),
          "offense")
          .when(col("team") === "football", "football")
          .otherwise("defense"))
      .withColumn("defensiveTeam",
        when(col("possessionTeam") === col("homeTeamAbbr"), col("visitorTeamAbbr"))
          .otherwise(col("homeTeamAbbr")))
  }

  /** §3.1 stages 7-8 (Tutorial.R:173-186): per-frame football presence
    * flag + ball coordinates, both as window aggregates; drops frames
    * with no football row (B14).
    */
  def withBall(df: DataFrame): DataFrame = {
    val flagged = RelationalOps.groupIndicator(
      frameKeys, col("displayName") === "Football", "footballInPlay")(df)
    RelationalOps.attachAnchor(
      frameKeys, col("displayName") === "Football",
      Map("xFootball" -> col("x"), "yFootball" -> col("y")))(flagged)
      .filter(col("footballInPlay"))
  }

  /** §3.1 stages 9-10 (Tutorial.R:189-203): keep pass-arrival frames and
    * compute each player's distance to the ball. `firstArrivalOnly`
    * enables the reference's commented-out E4 variant
    * (Tutorial.R:194-195).
    */
  def distanceAtArrival(df: DataFrame, firstArrivalOnly: Boolean = false): DataFrame = {
    val arrived = df.filter(col("event").isin(PassArrivalEvents: _*))
    val scoped =
      if (!firstArrivalOnly) arrived
      else arrived
        .withColumn("minArrivalFrame",
          min("frameId").over(Window.partitionBy("gameId", "playId")))
        .filter(col("frameId") === col("minArrivalFrame"))
        .drop("minArrivalFrame")
    scoped.withColumn("distToFootball",
      Kinematics.dist(col("x"), col("y"), col("xFootball"), col("yFootball")))
  }

  /** F2/F5 (Field Control.R:9-23, 138-144): pick the k-th biggest play
    * matching a description regex and pull its scalars to the driver.
    * The ONLY collect in the engine — it is bounded (one row) by
    * construction and drives downstream plan literals, exactly the
    * reference's pattern (SURVEY.md §7.4 scale posture).
    */
  def selectPlay(plays: DataFrame, descRegex: String, k: Int): Option[org.apache.spark.sql.Row] = {
    val rows = plays
      .filter(col("playDescription").rlike(descRegex))
      .orderBy(col("offensePlayResult").desc, col("playId").asc)
      .limit(k)
      .collect()
    // k-th ranked play or None when fewer than k match (the reference's
    // slice(k) yields zero rows there — never a lower-ranked substitute)
    rows.lift(k - 1)
  }

  /** §3.3 stage 1 (all coverages.R:118-127): line of scrimmage = ball x
    * at frame 1, attached per play (matching-scope join — Q2 pinned),
    * then distance features.
    */
  def withLineOfScrimmage(df: DataFrame): DataFrame = {
    val los = df
      .filter(col("displayName") === "Football" && col("frameId") === 1)
      .select(col("gameId"), col("playId"), col("x").as("los"))
    df.join(broadcast(los), Seq("gameId", "playId"), "left")
      .withColumn("dist_from_los", col("x") - col("los"))
      .withColumn("dist_from_mid", abs(col("y") - lit(160.0 / 6))) // field midline 26.67 (all coverages.R:127)
  }

  /** §3.3 stage 2 (all coverages.R:141-148): personnelD substring parse
    * ("4 DL, 2 LB, 5 DB" layout — positions 1/7/13).
    */
  def withPersonnel(plays: DataFrame): DataFrame =
    plays
      .withColumn("n_dl", substring(col("personnelD"), 1, 1).cast("double"))
      .withColumn("n_lb", substring(col("personnelD"), 7, 1).cast("double"))
      .withColumn("n_db", substring(col("personnelD"), 13, 1).cast("double"))

  val DefensivePositions: Seq[String] = Seq("SS", "FS", "CB", "LB", "OLB", "ILB", "DB") // all coverages.R:182-184

  /** §3.3 stage 10 (all coverages.R:313-315): per-play coverage = mode
    * of the per-frame predicted coverage, ties pinned (D4).
    */
  def playCoverage(scoredFrames: DataFrame,
                   predictedCol: String = "predicted_coverage"): DataFrame =
    RelationalOps.modeByGroup(Seq("gameId", "playId"), predictedCol, "play_coverage")(scoredFrames)

  /** §3.3 stage 11 + quirk Q7 (all coverages.R:317-326): per-coverage
    * summary — play count, mean EPA (null-skipping, D2), frequency with
    * the denominator computed from data (never the reference's
    * hard-coded 14575), sorted by plays desc.
    */
  def coverageSummary(playsWithCoverage: DataFrame,
                      coverageCol: String = "play_coverage"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    playsWithCoverage
      .groupBy(coverageCol)
      .agg(count(lit(1)).as("plays"), avg(col("epa")).as("def_epa"))
      .withColumn("freq",
        col("plays").cast("double") / sum(col("plays")).over(Window.partitionBy()))
      .orderBy(col("plays").desc, col(coverageCol).asc)
  }

  /** §3.3 stages 4-6 (all coverages.R:165-294): pass-arrived frames →
    * ball distance for defensive backs → wide per-frame feature matrix
    * (8 measures × 7 positions, zero-filled, Q5 pinned via first() over
    * nflId order).
    */
  def coverageFeatureMatrix(enriched: DataFrame): DataFrame = {
    val arrived = withBall(enriched)
      .filter(col("event") === "pass_arrived") // all coverages.R:166-169
      .withColumn("dist_from_ball",
        Kinematics.dist(col("x"), col("y"), col("xFootball"), col("yFootball")))
    val defenders = arrived
      .filter(col("position").isin(DefensivePositions: _*))
      .filter(col("xFootball").isNotNull && col("yFootball").isNotNull)
    val measures = Seq("s", "a", "dis", "o", "dir", "dist_from_los", "dist_from_mid", "dist_from_ball")
    RelationalOps.pivotWide(frameKeys, "position", DefensivePositions, measures,
      orderCol = "nflId")(defenders) // Q5 collisions pin to lowest nflId
  }
}
