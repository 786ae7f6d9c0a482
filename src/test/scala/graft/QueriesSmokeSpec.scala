package graft

import org.scalatest.funsuite.AnyFunSuite

/** §5.5 smoke: every registered query runs on sf0.001 and returns a
  * sane row count; every oracle-checked query has matching column sets
  * implied by the driver compare (checked by tools/check_oracle.py —
  * here we just guard against runtime regressions).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // Queries for which an empty result at sf0.001 is legitimate.
  private val mayBeEmpty = Set("q18_anti_join", "q39_neardup_pairs")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key corresponds to a registered query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
