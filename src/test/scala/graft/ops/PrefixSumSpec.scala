package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The two-phase prefix sum must be bit-identical to the naive
  * single-partition window whenever the bucket is aligned with the
  * global order — including empty buckets, negative values, buckets of
  * size 1, and everything landing in one bucket.
  */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(rows: Seq[(Long, Long)], bucketWidth: Long): Unit = {
    import spark.implicits._
    val df = rows.toDF("ts", "v").repartition(5)
    val naive = df
      .withColumn("run", sum(col("v")).over(
        Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)))
      .select("ts", "run").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val scaled = PrefixSum.scalableRunningSum(df,
        bucket = expr(s"ts div ${bucketWidth}L"), bucketName = "b",
        orderCols = Seq("ts"), valueCol = "v", outCol = "run")
      .select("ts", "run").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(scaled === naive, s"bucketWidth=$bucketWidth")
  }

  test("equivalent to the global window across bucket widths (incl. degenerate)") {
    // distinct ts (the op's contract: orderCols totally order within a
    // bucket), negatives, gaps that leave whole buckets empty
    val rows = Seq[(Long, Long)](
      (0L, 3L), (1L, -2L), (9L, 5L), (10L, 1L), (11L, -7L),
      (35L, 2L), (36L, 2L), (99L, -1L), (100L, 4L), (250L, 6L))
    for (w <- Seq(1L, 7L, 10L, 1000L)) check(rows, w)
  }

  test("randomized: equivalence holds for arbitrary data and bucket widths") {
    // deterministic LCG (no Math.random in tests that must replay)
    var seed = 0x5eedL
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (round <- 1 to 5) {
      val n = 50 + next(150)
      // distinct ts including negatives (bucket div truncates toward
      // zero for negatives — the equivalence must survive that too)
      val ts = scala.collection.mutable.LinkedHashSet.empty[Long]
      while (ts.size < n) ts += (next(10000) - 5000).toLong
      val rows = ts.toSeq.map(t => (t, (next(41) - 20).toLong))
      check(rows, bucketWidth = 1L + next(97))
    }
  }

  test("keyed plan shape: the row-scale window is partitioned by the bucket") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, 1L)).toDF("ts", "v")
    val out = PrefixSum.scalableRunningSum(df,
      bucket = expr("ts div 10L"), bucketName = "b",
      orderCols = Seq("ts"), valueCol = "v", outCol = "run")
    val p = out.queryExecution.executedPlan.toString
    // the within-bucket window hashes on b; the only SinglePartition
    // exchange feeds the bucket-grain offsets frame (post-aggregate)
    assert(p.contains("hashpartitioning(b#"), s"within-bucket window not keyed:\n$p")
    val lines = p.linesIterator.toVector
    val spIdx = lines.indexWhere(_.contains("Exchange SinglePartition"))
    assert(spIdx >= 0)
    assert(lines.drop(spIdx).exists(_.contains("HashAggregate")),
      s"SinglePartition exchange not over the aggregated bucket frame:\n$p")
  }
}
