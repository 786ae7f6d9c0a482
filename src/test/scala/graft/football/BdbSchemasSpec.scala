package graft.football

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BdbSchemasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = {
    val d = Paths.get("target", "fixture-bdb")
    Files.createDirectories(d)
    d
  }

  test("weekly tracking glob loads as one typed scan feeding the pipeline (A1-A3)") {
    val header = "time,x,y,s,a,dis,o,dir,event,nflId,displayName,jerseyNumber,position,frameId,team,gameId,playId,playDirection,route"
    Files.writeString(dir.resolve("week1.csv"),
      header + "\n2018-09-07T01:07:14,91.73,26.67,0.0,0.0,0.0,289.57,240.93,None,310.0,Matthew Stafford,9,QB,1,away,2018090600,75,left,\n")
    Files.writeString(dir.resolve("week2.csv"),
      header + "\n2018-09-14T01:07:14,20.0,30.0,5.0,1.0,0.5,90.0,45.0,ball_snap,500.0,Someone Else,21,CB,1,home,2018091400,90,right,\n")
    val df = BdbSchemas.loadTracking(spark, dir.resolve("week*.csv").toString)
    assert(df.count() === 2)
    assert(df.schema === BdbSchemas.tracking)
    // flows into the standardization op unchanged
    val std = graft.ops.Standardize.directionStandardize(df)
    val lx = std.filter(org.apache.spark.sql.functions.col("playDirection") === "left")
      .select("x").head().getDouble(0)
    assert(math.abs(lx - (120.0 - 91.73)) < 1e-9)
  }

  test("plays CSV loads with the full 27-column schema (A1)") {
    val cols = BdbSchemas.plays.fields.map(_.name)
    val row = Map(
      "gameId" -> "2018090600", "playId" -> "75",
      "playDescription" -> "(15:00) M.Stafford pass", "quarter" -> "1",
      "down" -> "1", "yardsToGo" -> "10", "possessionTeam" -> "DET",
      "offensePlayResult" -> "30", "epa" -> "0.5", "personnelD" -> "\"4 DL, 2 LB, 5 DB\"")
    Files.writeString(dir.resolve("plays.csv"),
      cols.mkString(",") + "\n" + cols.map(c => row.getOrElse(c, "")).mkString(",") + "\n")
    val df = BdbSchemas.loadPlays(spark, dir.resolve("plays.csv").toString)
    val r = df.head()
    assert(r.getAs[Long]("gameId") === 2018090600L)
    assert(r.getAs[Double]("epa") === 0.5)
    val p = CoveragePipeline.withPersonnel(df).head()
    assert(p.getAs[Double]("n_dl") === 4.0)
  }
}
