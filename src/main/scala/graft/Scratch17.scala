package graft

import org.apache.spark.sql.SparkSession

/** Round-17 scratch profiler (builder-side only, deleted before round
  * end): runs one query N times in a single session and prints each
  * run's wall seconds, so cross-run variance can be separated from
  * JVM/session effects. GRAFT_CC_DEBUG=1 additionally prints
  * duplicateClusters' per-round convergence timings.
  */
object Scratch17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = args.headOption.getOrElse("q117_dedup_collapse")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    SparkEntry.queries("q05_anchor_window")(spark, sfDir).count()
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scratch17] $name run $i: $s%.2f s")
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}

/** Per-stage wall profile of q211_bdb_capstone (r16 verdict task 8,
  * carried from r15): each stage is timed with the noop sink (guide
  * §1.4 — every column of every row computed, nothing written) and a
  * job description label (guide §1.5). Stage walls are CUMULATIVE
  * (each includes its upstream lazy pipeline); read deltas for
  * per-stage cost. Fixture synthesis is timed separately first.
  */
object Q211Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def timed[T](label: String)(body: => T): T = {
      spark.sparkContext.setJobDescription(s"q211 profile: $label")
      val t0 = System.nanoTime()
      val r = body
      println(f"[q211profile] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    timed("fixture synthesis (CSV write, marker-cached)") {
      graft.queries.CapstoneQueries.stageFixtures(spark, sfDir)
    }
    val dir = graft.queries.TempPaths.dir(spark, "q211_bdb_fixtures")
    def p(n: String) = new java.io.File(dir, n).getAbsolutePath
    val tracking = graft.football.BdbSchemas.loadTracking(spark, p("tracking") + "/*.csv")
    val plays = graft.football.BdbSchemas.loadPlays(spark, p("plays"))
    val games = graft.football.BdbSchemas.loadGames(spark, p("games"))
    timed("stage 1: tracking CSV scan")(noop(tracking))
    val enriched = graft.football.CoveragePipeline.enrich(tracking, plays, games)
    timed("stage 2: + enrich (standardize + broadcast dims)")(noop(enriched))
    val balled = graft.football.CoveragePipeline.withBall(enriched)
    timed("stage 3: + withBall (per-frame windows)")(noop(balled))
    val dist = graft.football.CoveragePipeline.distanceAtArrival(balled)
      .select(col("gameId"), col("playId"), col("frameId"),
        col("displayName"), col("sideOfBall"), col("event"),
        col("x"), col("y"), col("xFootball"), col("yFootball"),
        round(col("distToFootball"), 6).as("dist_to_ball"))
    timed("stage 4: + arrival filter + distance")(noop(dist))
    timed("stage 5: full query incl. orderBy") {
      noop(dist.orderBy("gameId", "playId", "frameId", "displayName"))
    }
    spark.stop()
  }
}
