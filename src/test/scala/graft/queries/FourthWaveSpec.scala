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

  test("q119: name-level fuzzy matches are unique, nonzero, symmetric-bounded, support-correct") {
    val out = SparkEntry.queries("q119_fuzzy_blocked_join")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // one best match per distinct name; matches are other names (dist >= 1)
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.forall(_._3 >= 1L), "a distinct name matched itself at distance 0")
    // blocking is symmetric, so if n1 best-matches n2 at d, n2's own best
    // (when ranked) can never be worse than d — n1 is one of its candidates
    val bestOf = out.map(r => r._1 -> r._3).toMap
    out.foreach { case (n1, n2, d, _) =>
      bestOf.get(n2).foreach(d2 => assert(d2 <= d, s"$n2 best $d2 > $d via $n1"))
    }
    // support counts are the true per-name record counts
    val truth = Tables.part(spark, sf).groupBy("p_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (n1, _, _, np) => assert(truth(n1) === np, s"support drift for $n1") }
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

  test("q122: every doc is ranked; isolated docs hold exactly the damping base") {
    val out = SparkEntry.queries("q122_pagerank_neardup")(spark, sf)
    val rows = out.collect()
    assert(rows.length.toLong === Tables.documents(spark, sf).count(),
      "PageRank must rank every document, connected or not")
    rows.foreach { r =>
      val (deg, rank) = (r.getLong(1), r.getLong(2))
      // deg 0 ⇒ no incoming contribution in any round ⇒ r = 0.15 exactly
      // (in 1e9 fixed point); deg > 0 keeps at least the damping base
      if (deg === 0L) assert(rank === 150000000L, s"isolated doc ${r.get(0)} drifted")
      else assert(rank >= 150000000L, s"doc ${r.get(0)} below damping base")
    }
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
