package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.GraftSession

/** Runnable end-to-end streaming demo (SURVEY.md §2.J): stages the
  * events parquet into a watched directory, runs the watermarked
  * tumbling-window plan as a file-source stream, and prints the
  * per-window counts. `sbt "runMain graft.streaming.StreamDemo [sfDir]"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.create(master = "local[4]", shufflePartitions = 4)
    spark.sparkContext.setLogLevel("WARN")

    val dir = Paths.get("target", "stream-demo")
    Files.createDirectories(dir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(dir.toString).schema
    val stream = graft.Tables.tsAsTimestamp(
      spark.readStream.schema(schema).parquet(dir.toString))
    val windowed = EventWindows.tumblingCounts(
      stream.select(col("ts"), col("event_type"), col("value")))

    val q = windowed.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("demo_windows").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("demo_windows")
      .orderBy("window_start", "event_type")
    println(s"[stream-demo] ${out.count()} window×type rows from $sfDir:")
    out.show(10, truncate = false)
    spark.stop()
  }
}
