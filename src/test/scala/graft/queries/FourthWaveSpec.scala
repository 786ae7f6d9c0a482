package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Properties of the fourth-wave queries (q119-q121) that the DuckDB
  * oracle alone can't state: cross-operator agreement (q120's native
  * session_window vs q21's lag+cumsum sessionization), the invariants a
  * correct session merge must satisfy, q119's exact-duplicate guarantee,
  * and an independent JVM recomputation of q121's Gini formula.
  */
class FourthWaveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q119: a part with an exactly-duplicated name always best-matches at distance 0") {
    val out = SparkEntry.queries("q119_fuzzy_blocked_join")(spark, sf)
    val dupKeys = Tables.part(spark, sf)
      .groupBy("p_name").agg(collect_list("p_partkey").as("ks"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(explode(col("ks")).as("p_partkey"))
    val nonZero = out.join(dupKeys, Seq("p_partkey")).filter(col("dist") =!= 0L).count()
    assert(nonZero === 0L, "exact-dup part matched at nonzero distance")
    // and each record appears at most once (best match is unique)
    assert(out.count() === out.select("p_partkey").distinct().count())
  }

  test("q120 native session_window agrees with q21 lag+cumsum on sessions per user") {
    // Boundary semantics differ only when a gap is EXACTLY 30 min —
    // measure-zero on nanosecond timestamps — so the two independent
    // formulations must produce identical session counts per user.
    val native = SparkEntry.queries("q120_session_window")(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_native"))
    val lagged = SparkEntry.queries("q21_sessionize")(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_lag"))
    val disagree = native.join(lagged, Seq("user_id"), "full")
      .filter(col("n_native").isNull || col("n_lag").isNull ||
        col("n_native") =!= col("n_lag")).count()
    assert(disagree === 0L)
  }

  test("q120: per-user sessions are disjoint, gap-separated, and partition all events") {
    val out = SparkEntry.queries("q120_session_window")(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("start_us")
    val overlapping = out.withColumn("prev_end", lag(col("end_us"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("start_us") < col("prev_end"))
      .count()
    assert(overlapping === 0L, "session windows overlap")
    val totals = out.groupBy("user_id").agg(sum("n_events").as("n_out"))
      .join(Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("n_in")),
        Seq("user_id"), "full")
      .filter(col("n_out").isNull || col("n_in").isNull || col("n_out") =!= col("n_in"))
      .count()
    assert(totals === 0L, "session n_events do not partition the event count")
  }

  test("q121 matches an independent JVM recomputation of the Gini formula") {
    val got = SparkEntry.queries("q121_gini_source_budget")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    val raw = Tables.documents(spark, sf)
      .select(col("lang"), col("source"), length(col("text")).cast("long").as("y"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(raw.nonEmpty && raw.keySet === got.keySet)
    raw.foreach { case (k, ys) =>
      val n = ys.length.toLong
      val sumY = ys.sum
      val iy = ys.zipWithIndex.map { case (y, i) => (i + 1) * y }.sum
      val g = BigDecimal((2 * iy - (n + 1) * sumY).toDouble / (n * sumY).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(k) - g) < 1e-9, s"$k: got ${got(k)}, want $g")
      assert(g >= 0.0 && g < 1.0, s"$k: gini out of [0,1)")
    }
  }
}
