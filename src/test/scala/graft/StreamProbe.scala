package graft

import org.apache.spark.sql.SparkSession

/** Builder-side probe (test scope, not part of the library): phase
  * breakdown of the streaming harness queries' wall clock — how much is
  * data work vs micro-batch machinery — to document the measured floor.
  * `sbt "Test/runMain graft.StreamProbe q123"`.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val names = SparkEntry.queries.keys.filter(n => args.exists(n.contains)).toSeq.sorted
    val progress = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      def onQueryStarted(e: QueryStartedEvent): Unit = ()
      def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      def onQueryProgress(e: QueryProgressEvent): Unit =
        progress += ((e.progress.name, e.progress.json))
    })
    names.foreach { n =>
      // warm pass, then measured pass
      SparkEntry.queries(n)(spark, sfDir).count()
      progress.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      println(s"== $n total=${"%.2f".format(total)}s batches=${progress.size}")
      progress.foreach { case (_, j) => println(s"  $j") }
    }
    spark.stop()
  }
}
