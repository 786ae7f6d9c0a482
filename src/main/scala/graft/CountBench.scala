package graft

import org.apache.spark.sql.SparkSession

/** Builder tooling (round-13 verdict task 5, the q148 drift
  * adjudication): times selected queries under the LEGACY
  * `DataFrame.count()` forcing — the forcing BENCH_r11-and-earlier used,
  * which lets Catalyst rewrite the counted plan (and for some shapes
  * optimize the measured work away; see Bench.scala's toRdd note) — so a
  * round-over-round drift can be split into "the forcing changed" vs
  * "the code changed". Same protocol as Bench otherwise: warmup, min of
  * two interleaved passes, cache clear + GC between runs.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> tools/run_main.sh graft.CountBench <substr>...
  */
object CountBench {
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
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    SparkEntry.queries("q05_anchor_window")(spark, sfDir).count()
    graft.queries.CapstoneQueries.stageFixtures(spark, sfDir)
    val selected = SparkEntry.queries.filter { case (n, _) => args.exists(n.contains) }
    require(selected.nonEmpty, "CountBench: no query matched the selectors")
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      elapsed
    }
    val ordered = selected.toSeq.sortBy(_._1)
    val pass1 = ordered.map { case (name, fn) => (name, once(fn)) }.toMap
    val out = ordered.map { case (name, fn) =>
      s""""$name":${math.min(pass1(name), once(fn))}"""
    }
    println(out.mkString("{\"forcing\":\"count\",", ",", s""","sf":"$sfDir"}"""))
    spark.stop()
  }
}
