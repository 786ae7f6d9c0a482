package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CacheScope pairs persist with unpersist on the query's own path —
  * the session must hold ZERO cached entries after the call, without any
  * harness-side clearCache, and the returned frame must be fully
  * materialized (re-consumable with no recompute of the dropped cache).
  */
class CacheScopeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("withPersisted returns the built result and leaves no cached state behind") {
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache() // isolate from other suites
    val base = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "grp")
    val inter = base.groupBy("grp").agg(count(lit(1)).as("n"))
    val out = CacheScope.withPersisted(inter) {
      // two consumers of the persisted frame, like the query pattern
      val total = inter.agg(sum(col("n")).as("t"))
      inter.crossJoin(broadcast(total))
        .select(col("grp"), col("n"), col("t"))
        .orderBy("grp")
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "withPersisted leaked a cached frame past its scope")
    val rows = out.collect()
    assert(rows.length === 7)
    assert(rows.map(_.getLong(1)).sum === 100L)
    assert(rows.forall(_.getLong(2) === 100L))
    // the result is checkpoint-backed: consuming it twice is stable and
    // does not resurrect the unpersisted intermediate
    assert(out.count() === 7)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("withPersisted unpersists even when the build throws") {
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    val inter = (1 to 10).toDF("x")
    intercept[RuntimeException] {
      CacheScope.withPersisted(inter) { throw new RuntimeException("boom") }
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "withPersisted leaked a cached frame after a failed build")
  }
}
