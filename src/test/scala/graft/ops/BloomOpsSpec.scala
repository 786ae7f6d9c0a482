package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the two properties the q129 oracle can't see: the bloom pass
  * never drops a matching key (superset semantics — the reason fixed
  * sizing is safe at any scale), and the probe is a plain pre-shuffle
  * filter expression, not a join.
  */
class BloomOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloomReduce admits every matching key and prunes most of the rest") {
    val fact = spark.range(0, 100000).select(col("id").as("k"))
    val dim = spark.range(0, 100000, 1000).select(col("id").as("dk")) // 100 keys
    val reduced = BloomOps.bloomReduce(fact, "k", dim, "dk",
      expectedItems = 1000L, numBits = 16000L)
    val kept = reduced.select("k").collect().map(_.getLong(0)).toSet
    val expected = dim.select("dk").collect().map(_.getLong(0)).toSet
    assert(expected.subsetOf(kept), "bloom filter dropped a matching key")
    assert(kept.size < 20000, s"bloom filter pruned almost nothing: ${kept.size}")
  }

  test("mixed-type keys are rejected (xxhash64 is type-sensitive)") {
    // int 5 and long 5 hash differently — silently dropping matches is
    // the one failure mode the operator promises not to have, so the
    // mismatch must fail loudly instead
    val fact = spark.range(0, 100).select(col("id").cast("int").as("k"))
    val dim = spark.range(0, 10).select(col("id").as("dk"))
    val e = intercept[IllegalArgumentException] {
      BloomOps.bloomReduce(fact, "k", dim, "dk", 100L, 1600L)
    }
    assert(e.getMessage.contains("type"))
  }

  test("the bloom probe plans as a filter over the fact scan, not a join") {
    val fact = spark.range(0, 1000).select(col("id").as("k"))
    val dim = spark.range(0, 10).select(col("id").as("dk"))
    val reduced = BloomOps.bloomReduce(fact, "k", dim, "dk", 100L, 1600L)
    val plan = reduced.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"bloom probe planned a join:\n$plan")
  }
}
