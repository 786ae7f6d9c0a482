package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Properties of the layout/allocation queries that the DuckDB oracle
  * alone can't state: the Morton interleave used by q107/q114 must be
  * a bijection whose tiles bound both dimensions, and q110's
  * largest-remainder allocation must hit the budget EXACTLY with every
  * quota within one of its proportional share.
  */
class LayoutQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Reference JVM interleave of two 10-bit values — the spec's
    * independent formulation of the SQL bit expression.
    */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 10).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("the SQL Morton expression equals the JVM reference on random keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813)
    val pts = Seq.fill(500)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val zTerms = (0 until 10).flatMap(i => Seq(
      s"(shiftright(xb, $i) & 1) * ${1L << (2 * i)}L",
      s"(shiftright(yb, $i) & 1) * ${1L << (2 * i + 1)}L")).mkString(" + ")
    val got = pts.toDF("xb", "yb").withColumn("z", expr(zTerms))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z === mortonRef(x, y), s"($x,$y)") }
  }

  test("Morton interleave is a bijection on the 1024x1024 grid (deinterleave recovers)") {
    val coord = Gen.choose(0L, 1023L)
    check(Prop.forAll(coord, coord) { (x: Long, y: Long) =>
      val z = mortonRef(x, y)
      val xBack = (0 until 10).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val yBack = (0 until 10).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      xBack == x && yBack == y
    })
  }

  test("a 4096-cell tile bounds both dimensions to 64 (the q107 bbox claim)") {
    val coord = Gen.choose(0L, 1023L)
    check(Prop.forAll(coord, coord, coord, coord) { (x1: Long, y1: Long, x2: Long, y2: Long) =>
      val sameTile = mortonRef(x1, y1) / 4096 == mortonRef(x2, y2) / 4096
      // tile id = interleave of the high 4 bits of each dimension, so
      // equal tiles pin x>>6 and y>>6
      !sameTile || ((x1 >> 6) == (x2 >> 6) && (y1 >> 6) == (y2 >> 6))
    })
  }

  test("q114's qualifying-tile bit math equals a brute-force tile scan") {
    // the query's driver-side list for xb in [4,135]
    val listed = (for { xh <- Seq(0L, 1L, 2L); yh <- 0L until 16L } yield
      (0 until 4).map(j => (((xh >> j) & 1L) << (2 * j)) | (((yh >> j) & 1L) << (2 * j + 1))).sum).toSet
    // brute force: every tile containing at least one xb in [4,135]
    val brute = (for { x <- 4L to 135L; y <- 0L until 1024L by 64L } yield
      mortonRef(x, y) / 4096).toSet
    assert(brute.subsetOf(listed), s"missing tiles: ${brute -- listed}")
  }

  test("q110 allocation sums to the budget exactly, each quota within 1 of proportional") {
    val out = graft.SparkEntry.queries("q110_budget_mixture")(spark, "/root/testdata/sf0.001")
      .groupBy("source").agg(count(lit(1)).as("taken"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum === 200L, s"allocation missed the budget: $out")
    val w = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .groupBy("source").agg(sum(col("n_chars")).as("chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = w.values.sum.toDouble
    out.foreach { case (src, taken) =>
      val share = 200.0 * w(src) / total
      assert(taken >= math.floor(share).toLong && taken <= math.floor(share).toLong + 1,
        s"$src: took $taken for share $share")
    }
  }
}
