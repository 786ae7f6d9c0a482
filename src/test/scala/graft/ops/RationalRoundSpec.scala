package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The family-default exact-rational rounding idiom (PARITY rule 4
  * fix 2): `round6(a/b)` as `(2a + b) div (2b)` micro units on
  * non-negative a, sign applied outside, then ONE int→double cast and
  * ONE division by 1e6. This spec pins the idiom against an exact
  * BigDecimal HALF_UP reference so an edit to any of the ~20 call
  * sites can't silently reintroduce the q70 sf1 midpoint split
  * (doc 2240: -125523827/22 micro = -5705628.5 exactly — the double
  * path rounds it engine-dependently, the integer path doesn't).
  */
class RationalRoundSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Exact reference: a is the micro-unit numerator, the value is
    * a/(b·1e6); HALF_UP (away from zero) of the exact rational a/b to
    * integer micro units, then one exact int→double /1e6 — the same
    * two final ops the idiom performs.
    */
  private def ref(a: Long, b: Long): Double = {
    require(b > 0)
    new java.math.BigDecimal(a)
      .divide(new java.math.BigDecimal(b), 0, java.math.RoundingMode.HALF_UP)
      .longValueExact().toDouble / 1e6
  }

  /** The idiom as deployed: integer micro units, sign outside. */
  private def idiom(a: Long, b: Long): Double = {
    val m = (2L * math.abs(a) + b) / (2L * b)
    (if (a < 0) -m else m).toDouble / 1e6
  }

  test("q70's actual sf1 midpoint and its neighbors") {
    // -125523827/22 = -5705628.5 micro exactly: half-away must give
    // -5.705629 (the value DuckDB produced and Spark's double path
    // did not)
    val a = -125523827L; val b = 22L
    assert(idiom(a, b) === -5.705629)
    assert(ref(a, b) === -5.705629)
    assert(idiom(a + 1, b) === ref(a + 1, b))
    assert(idiom(a - 1, b) === ref(a - 1, b))
  }

  test("idiom == BigDecimal HALF_UP on exhaustive small denominators") {
    // every midpoint-capable small denominator, all residues
    for (b <- 1L to 64L; a <- -3L * b to 3L * b)
      assert(idiom(a, b) === ref(a, b), s"a=$a b=$b")
  }

  test("randomized: idiom == BigDecimal HALF_UP incl. forced midpoints") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 20000) {
      val b = rnd.nextInt(100000).toLong + 1L
      val a = rnd.nextLong() % (b * 10000000L)
      assert(idiom(a, b) === ref(a, b), s"a=$a b=$b")
      // force an exact micro-midpoint when b is even: a = k*b + b/2
      if (b % 2 == 0) {
        val k = rnd.nextInt(1000000).toLong
        val mid = k * b + b / 2
        assert(idiom(mid, b) === ref(mid, b), s"mid=$mid b=$b")
      }
    }
  }

  test("the Spark-side expression matches the JVM idiom") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val rows = (1 to 500).map { _ =>
      val b = rnd.nextInt(10000).toLong + 1L
      val a = rnd.nextLong() % (b * 1000000L)
      (a, b)
    } :+ ((-125523827L, 22L)) :+ ((11L, 22L)) :+ ((1L, 2L))
    val df = rows.toDF("a", "b")
      .withColumn("r",
        (when(col("a") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("(2 * abs(a) + b) div (2 * b)")).cast("double") / lit(1e6))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.foreach { case (a, b, r) =>
      assert(r === ref(a, b), s"spark a=$a b=$b")
    }
  }
}
