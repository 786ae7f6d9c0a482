package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{FootballFixtures, TestSpark}

class RelationalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val tracking = FootballFixtures.tracking(spark)
  private val frameKeys = Seq("gameId", "playId", "frameId")

  test("groupIndicator flags only frames containing the football row (D7/B14)") {
    val flagged = RelationalOps.groupIndicator(
      frameKeys, col("displayName") === "Football", "footballInPlay")(tracking)
    val byFrame = flagged.select("gameId", "playId", "frameId", "footballInPlay")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) -> r.getBoolean(3)).toMap
    assert(byFrame((1L, 10L, 1)) === true)
    assert(byFrame((1L, 10L, 2)) === false) // football-less frame
    assert(byFrame((1L, 10L, 3)) === true)
  }

  test("attachAnchor broadcasts the ball row's coords to every group row (D8/E3)") {
    val withBall = RelationalOps.attachAnchor(
      frameKeys, col("displayName") === "Football",
      Map("ball_x" -> col("x"), "ball_y" -> col("y")))(tracking)
    val f1 = withBall.filter(col("frameId") === 1 && col("playId") === 10 && col("nflId") === 101)
      .select("ball_x", "ball_y").head()
    assert(f1.getDouble(0) === 98.0 && f1.getDouble(1) === 22.0)
    // football-less frame → null anchor
    val f2 = withBall.filter(col("frameId") === 2 && col("playId") === 10)
      .select("ball_x").collect()
    assert(f2.forall(_.isNullAt(0)))
  }

  test("attachAnchorJoin gives the same result as attachAnchor (C4 ≡ D8)") {
    val a = RelationalOps.attachAnchor(
      frameKeys, col("displayName") === "Football", Map("ball_x" -> col("x")))(tracking)
    val b = RelationalOps.attachAnchorJoin(
      frameKeys, col("displayName") === "Football", Map("ball_x" -> col("x")))(tracking)
    val cols = Seq("gameId", "playId", "frameId", "displayName", "ball_x")
    assert(a.select(cols.map(col): _*).exceptAll(b.select(cols.map(col): _*)).isEmpty)
    assert(b.select(cols.map(col): _*).exceptAll(a.select(cols.map(col): _*)).isEmpty)
  }

  test("modeByGroup picks most frequent value; ties break to greatest value (D4)") {
    import spark.implicits._
    val df = Seq(
      (1, "zone"), (1, "zone"), (1, "man"),          // clear winner
      (2, "man"), (2, "zone")                        // tie → "zone" (desc)
    ).toDF("k", "v")
    val m = RelationalOps.modeByGroup(Seq("k"), "v", "mode_v")(df)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m(1) === "zone")
    assert(m(2) === "zone") // pinned tie-break: value desc
  }

  test("topKPerGroup keeps k rows per group in order (E1/F2)") {
    import spark.implicits._
    val df = Seq((1, 10.0), (1, 30.0), (1, 20.0), (2, 5.0)).toDF("k", "v")
    val top2 = RelationalOps.topKPerGroup(Seq("k"), Seq(col("v").desc), 2)(df)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(top2 === Set((1, 30.0), (1, 20.0), (2, 5.0)))
  }

  test("pivotWide emits {measure}_{value} columns and zero-fills absent positions (H1/Q5)") {
    val arrived = tracking.filter(col("event") === "pass_arrived" && col("position").isNotNull)
    val wide = RelationalOps.pivotWide(
      Seq("gameId", "playId", "frameId"), "position", Seq("CB", "FS", "LB"), Seq("s", "a"))(arrived)
    assert(wide.columns.toSet === Set("gameId", "playId", "frameId",
      "s_CB", "a_CB", "s_FS", "a_FS", "s_LB", "a_LB"))
    val row = wide.head()
    // FS absent from frame 3 → zero-filled, not null
    assert(row.getAs[Double]("s_FS") === 0.0)
    // CB collision (two CBs) pins to the lowest nflId (101 → s=5.5)
    assert(row.getAs[Double]("s_CB") === 5.5)
  }

  test("pivotWide collision pinning is stable across partition counts (Q5 at scale)") {
    val arrived = tracking.filter(col("event") === "pass_arrived" && col("position").isNotNull)
    val values = (1 to 7).map { n =>
      RelationalOps.pivotWide(
        Seq("gameId", "playId", "frameId"), "position", Seq("CB"), Seq("s"))(
        arrived.repartition(n))
        .head().getAs[Double]("s_CB")
    }
    assert(values.distinct === Seq(5.5))
  }
}
