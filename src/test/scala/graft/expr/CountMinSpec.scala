package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The count-min aggregate's contract. Unlike space-saving, the counter
  * table is a deterministic function of the input MULTISET (update =
  * increment, merge = element-wise add), so the whole table must be
  * BIT-IDENTICAL under any partitioning — the property q179's oracle
  * hash-match rides on. Point estimates carry the classic one-sided
  * guarantee: true ≤ est, and est ≤ true + n/w per hash row in the
  * worst case (here asserted as est − true ≤ n − true, plus the exact
  * JVM-vs-relational recomputation which is the tight check).
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def counters(df: org.apache.spark.sql.DataFrame, w: Int): Seq[Long] =
    df.agg(expr(s"count_min(item, $w)").as("cm")).head().getSeq[Long](0)

  /** JVM-side reference estimate straight from CountMin's published hash. */
  private def refEstimate(table: Seq[Long], w: Int, item: String): Long = {
    val hex = CountMin.md5Hex(item.getBytes("UTF-8"))
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(16, 31), 16)
    (0 until CountMin.Depth).map { r =>
      val g = ((h1 + r * h2) % CountMin.Prime % w).toInt
      table(r * w + g)
    }.min
  }

  test("counter table is bit-identical under any partitioning / merge order") {
    import spark.implicits._
    val rows = (1 to 40).flatMap(i => Seq.fill(300 / i)(s"t$i"))
    val w = 16
    val reference = counters(rows.toDF("item").repartition(1), w)
    assert(reference.length === CountMin.Depth * w)
    assert(reference.sum === rows.size.toLong * CountMin.Depth) // every input hits d cells
    for (parts <- Seq(3, 7, 32)) {
      assert(counters(rows.toDF("item").repartition(parts), w) === reference,
        s"parts=$parts: merge order changed the counters")
    }
  }

  test("point estimates: one-sided guarantee vs exact counts, exact under no collisions") {
    import spark.implicits._
    val rows = (1 to 40).flatMap(i => Seq.fill(300 / i)(s"t$i"))
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // w = 16 << 40 distinct: collisions guaranteed, estimates only overcount
    val narrow = counters(rows.toDF("item").repartition(5), 16)
    exact.foreach { case (it, t) =>
      val est = refEstimate(narrow, 16, it)
      assert(est >= t, s"$it: est=$est under true=$t — CMS must never undercount")
    }
    assert(exact.exists { case (it, t) => refEstimate(narrow, 16, it) > t },
      "w=16 on 40 items produced zero collisions — vacuous fixture")
    // w = 4096 >> 40: with this hash family no bucket is shared, so the
    // estimate IS the exact count
    val wide = counters(rows.toDF("item").repartition(5), 4096)
    exact.foreach { case (it, t) =>
      assert(refEstimate(wide, 4096, it) === t, s"$it: wide sketch not exact")
    }
  }

  test("nulls are skipped; md5Hex matches Spark's md5()") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("item")
    val table = counters(df, 8)
    assert(table.sum === 3L * CountMin.Depth) // the null row contributes nothing
    val sparkMd5 = Seq("a").toDF("x").select(md5(col("x"))).head().getString(0)
    assert(CountMin.md5Hex("a".getBytes("UTF-8")) === sparkMd5)
  }

  test("cm_query (native codegen probe) equals the JVM reference estimate for every item") {
    import spark.implicits._
    val rows = (1 to 40).flatMap(i => Seq.fill(300 / i)(s"t$i"))
    val w = 16
    val table = counters(rows.toDF("item").repartition(3), w)
    val got = rows.distinct.toDF("item")
      .crossJoin(rows.toDF("item2").agg(expr(s"count_min(item2, $w)").as("cm")))
      .selectExpr("item", s"cm_query(cm, item, $w) AS est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.distinct.foreach { it =>
      assert(got(it) === refEstimate(table, w, it), it)
    }
    // mismatched sketch type fails at analysis, not with a cast error mid-job
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("a", 1.0)).toDF("item", "notasketch")
        .selectExpr("cm_query(array(notasketch), item, 8)").collect()
    }
    assert(e.getMessage.contains("array<bigint>"), e.getMessage)
  }

  test("invalid w fails at analysis time (FoldableK, as the other three sketches)") {
    import spark.implicits._
    val df = Seq("a").toDF("item")
    for (bad <- Seq("0", "-2")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.agg(expr(s"count_min(item, $bad)")).collect()
      }
      assert(e.getMessage.contains("k > 0"), s"w=$bad: ${e.getMessage}")
    }
  }
}
