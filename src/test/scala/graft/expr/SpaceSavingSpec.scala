package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The space-saving aggregate's contract, split by mode:
  *  - under capacity (< k distinct): EXACT counts, zero error — the
  *    bit-stable mode q165 hash-gates;
  *  - over capacity: the published guarantees must hold under ANY
  *    partitioning/merge order — presence of every item with true
  *    count > n/k, est within the error band — checked against brute
  *    force on a Zipf-ish skewed fixture at several partition counts
  *    (repartition reshuffles arbitrarily, so each count exercises a
  *    different merge tree).
  */
class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, (Long, Long)] =
    df.agg(expr(s"heavy_hitters(item, $k)").as("hh"))
      .selectExpr("explode(hh) AS e").select("e.item", "e.est", "e.err")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("under capacity the sketch IS the exact count with zero error") {
    import spark.implicits._
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val got = sketch(items.toDF("item").repartition(4), k = 8)
    assert(got === Map("a" -> ((5L, 0L)), "b" -> ((3L, 0L)), "c" -> ((1L, 0L))))
  }

  test("over capacity: guarantees hold under any merge order (skewed fixture)") {
    import spark.implicits._
    // Zipf-ish: item i appears ~N/i times; 40 distinct, k = 8
    val rows = (1 to 40).flatMap(i => Seq.fill(400 / i)(s"t$i"))
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val k = 8
    for (parts <- Seq(1, 3, 16)) {
      val got = sketch(rows.toDF("item").repartition(parts), k)
      assert(got.size <= k, s"parts=$parts: more than k entries")
      // presence: every item with true count > n/k must survive
      exact.filter(_._2 > n / k).keys.foreach { it =>
        assert(got.contains(it), s"parts=$parts: heavy item $it missing (true=${exact(it)})")
      }
      // bands: |est - true| bounded by n/k for tracked items (single
      // partition is one-sided: true <= est <= true + err)
      got.foreach { case (it, (est, err)) =>
        val t = exact(it)
        if (parts == 1) {
          assert(t <= est && est <= t + err, s"$it: est=$est err=$err true=$t")
          assert(err <= n / k, s"$it: err=$err > n/k=${n / k}")
        } else {
          assert(math.abs(est - t) <= n / k, s"parts=$parts $it: est=$est true=$t band=${n / k}")
        }
      }
    }
  }

  test("the sketch result sorts (est desc, item asc) and SQL resolution works via extensions") {
    import spark.implicits._
    val df = (Seq.fill(4)("x") ++ Seq.fill(4)("a") ++ Seq("z")).toDF("item")
    val arr = df.agg(expr("heavy_hitters(item, 8)").as("hh"))
      .selectExpr("transform(hh, e -> e.item) AS names").head().getSeq[String](0)
    assert(arr === Seq("a", "x", "z")) // ties on est=4 break by item asc
  }

  test("invalid k fails at ANALYSIS time with a named message, not deep in update()") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("item")
    // k = 0 and k = -3: the eviction path would otherwise throw
    // NoSuchElementException from evictMin on an empty map mid-job
    for (bad <- Seq("0", "-3")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.agg(expr(s"heavy_hitters(item, $bad)")).collect()
      }
      assert(e.getMessage.contains("k > 0"), s"k=$bad: ${e.getMessage}")
    }
    // non-foldable k (a column) is a planning-time error too
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("a", 3)).toDF("item", "kcol")
        .agg(expr("heavy_hitters(item, kcol)")).collect()
    }
    assert(e2.getMessage.contains("foldable"), e2.getMessage)
    // same trait guards the other two sketches in the trio
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("v").agg(expr("kmv_distinct(v, 0)")).collect()
    }
    assert(e3.getMessage.contains("k > 0"), e3.getMessage)
    val e4 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1.0, 2L)).toDF("s", "p").agg(expr("top_k_pairs(s, p, -1)")).collect()
    }
    assert(e4.getMessage.contains("k > 0"), e4.getMessage)
  }
}
