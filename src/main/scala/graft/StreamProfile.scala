package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the streaming gate floor: runs one gate query
  * and prints per-batch durationMs from StreamingQueryProgress plus
  * wall-clock phase splits (build / start / drain / stop / read-back).
  * `sbt "runMain graft.StreamProfile q60_stream_hourly [sfDir]"`.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q60_stream_hourly")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup as Bench does
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    SparkEntry.queries("q05_anchor_window")(spark, sfDir).count()

    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[prof] query started at ${System.nanoTime() / 1e9}")
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        println(s"[prof] batch ${e.progress.batchId}: durationMs=${e.progress.durationMs} " +
          s"rows=${e.progress.numInputRows} stateOps=${e.progress.stateOperators.length}")
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"[prof] query terminated at ${System.nanoTime() / 1e9}")
    }
    spark.streams.addListener(listener)

    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(qname)(spark, sfDir).count()
      println(f"[prof] run $i total ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
