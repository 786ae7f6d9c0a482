package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Properties of the record-linkage + statistics wave (q196–q205) the
  * DuckDB oracle alone can't state: independent JVM brute-force
  * recomputations of OLS, ACF and CUSUM from raw collected rows, a
  * reference edit-distance check for q196, and structural invariants
  * (bounds, gate booleans, conservation) for the rest.
  */
class LinkageStatsWaveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def editDistance(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("q196 distances equal a reference DP edit distance on the same signatures") {
    val sigs = Tables.documents(spark, sf)
      .select(col("doc_id"), substring(col("text"), 1, 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q196_fuzzy_edit_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, lev) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b)
      assert(lev === editDistance(sigs(a), sigs(b)).toLong && lev <= 16L, s"pair ($a,$b)")
    }
  }

  test("q197/q203 structural: jw in [0.8,1], entities >= 2 docs and conserve the corpus") {
    val jw = SparkEntry.queries("q197_jaro_winkler_linkage")(spark, sf).collect()
    assert(jw.nonEmpty)
    jw.foreach(r => assert(r.getDouble(4) >= 0.8 && r.getDouble(4) <= 1.0))
    val ents = SparkEntry.queries("q203_entity_resolution")(spark, sf).collect()
    assert(ents.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(ents.forall(_.getLong(1) >= 2L))
    assert(ents.map(_.getLong(1)).sum <= nDocs)
  }

  test("q198 OLS matches a JVM recomputation from raw rows (same quantization)") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), expr("ts_us div 1000000").as("xs"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1) - 1704067200L,
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    // columns: event_type, n, slope_micro, intercept_micro, r2_micro,
    // slope, intercept, r2 — the doubles are micro/1e6, so the
    // tolerance vs the infinite-precision recomputation is the 1-micro
    // trunc quantization PLUS up to 1 micro of staging slack: the
    // intercept's quotient-remainder expansion is parity-exact across
    // engines but can deviate ±1 micro from the one-shot trunc when an
    // extracted quotient and its residual oppose in sign (round-12
    // advisor; a9's 1e-9 r2 stage is negligible on top)
    val got = SparkEntry.queries("q198_ols_trend")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    rows.groupBy(_._1).foreach { case (et, rs) =>
      val n = rs.length.toDouble
      val sx = rs.map(_._2).sum.toDouble
      val sxx = rs.map(t => t._2 * t._2).sum.toDouble
      val sxy = rs.map(t => BigDecimal(t._2) * t._3).sum.toDouble
      val sy = rs.map(_._3).sum.toDouble
      val syy = rs.map(t => t._3 * t._3).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val r2 = math.pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (gs, gi, gr) = got(et)
      assert(math.abs(gs - slope) <= 2e-6, s"$et slope: got $gs want $slope")
      assert(math.abs(gi - intercept) <= 2e-6, s"$et intercept: got $gi want $intercept")
      assert(math.abs(gr - r2) <= 2e-6, s"$et r2: got $gr want $r2")
      assert(gr >= 0.0 && gr <= 1.0)
    }
  }

  test("q199/q200/q201 gate invariants: bounds hold, digit mass conserves") {
    val hll = SparkEntry.queries("q199_hll_bound_gate")(spark, sf).collect()
    assert(hll.nonEmpty && hll.forall(_.getBoolean(2)))
    val ben = SparkEntry.queries("q200_benford_audit")(spark, sf).collect()
    assert(ben.map(_.getLong(1)).sum === ben.head.getLong(2)) // Σo = n
    ben.foreach(r => assert(r.getLong(0) >= 1L && r.getLong(0) <= 9L))
    val jsd = SparkEntry.queries("q201_js_divergence")(spark, sf).collect()
    assert(jsd.nonEmpty)
    jsd.foreach { r =>
      // JSD (nats) in [0, ln 2]; each floored term can undershoot by
      // <1 micro, so allow vocab-many micros of slack below zero
      assert(r.getLong(2) >= -1000L && r.getDouble(3) <= 0.6931472, r.toString)
    }
  }

  private def hourly(et: String): Seq[(Long, Long)] =
    Tables.events(spark, sf)
      .filter(col("event_type") === et)
      .select(expr("ts_us div 3600000000").as("h"), col("value"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (h, vs) => (h, vs.map(_._2).sum) }.toSeq.sortBy(_._1)

  test("q204/q205 match JVM recomputations of ACF and CUSUM from raw rows") {
    val acf = SparkEntry.queries("q204_hourly_acf")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val cus = SparkEntry.queries("q205_cusum_changepoint")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val types = acf.keys.map(_._1).toSeq.distinct
    assert(types.nonEmpty && cus.nonEmpty)
    types.foreach { et =>
      val hs = hourly(et)
      val n = hs.length.toLong
      val s = hs.map(_._2).sum
      val dev = hs.map { case (h, y) => (h, n * y - s) }
      val devMap = dev.toMap
      val c0 = dev.map { case (_, dv) => BigInt(dv) * BigInt(dv) }.sum
      (1L to 6L).foreach { k =>
        val pairs = dev.flatMap { case (h, dv) => devMap.get(h + k).map(dv2 => (dv, dv2)) }
        val ck = pairs.map { case (a, b) => BigInt(a) * BigInt(b) }.sum
        val (nPairs, rMicro) = acf((et, k))
        assert(nPairs === pairs.length.toLong, s"$et k=$k n_pairs")
        val r = ck.toDouble / c0.toDouble
        assert(math.abs(rMicro - math.floor(r * 1e6).toLong) <= 1, s"$et k=$k r_micro")
      }
      // CUSUM: running sum peaks where the query says; final sum is 0
      val cusum = dev.scanLeft(0L) { case (acc, (_, dv)) => acc + dv }.drop(1)
      assert(cusum.last === 0L, s"$et CUSUM telescopes to 0")
      val best = dev.map(_._1).zip(cusum)
        .sortBy { case (h, c) => (-math.abs(c), h) }.head
      val (nh, cph, cAt) = cus(et)
      assert(nh === n && cph === best._1 && cAt === best._2, s"$et changepoint")
    }
  }
}
