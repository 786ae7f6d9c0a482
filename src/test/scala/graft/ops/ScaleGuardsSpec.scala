package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScaleGuardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("requireAllPairsSafe passes small inputs through unchanged") {
    import spark.implicits._
    val df = (1 to 100).toDF("id")
    val out = ScaleGuards.requireAllPairsSafe(df, "test")
    assert(out.count() === 100)
  }

  test("requireAllPairsSafe fails fast above the configured bound") {
    import spark.implicits._
    spark.conf.set("spark.graft.allPairs.maxRows", "50")
    try {
      val df = (1 to 100).toDF("id")
      val e = intercept[IllegalArgumentException] {
        ScaleGuards.requireAllPairsSafe(df, "q_test_baseline")
      }
      assert(e.getMessage.contains("q_test_baseline"))
      assert(e.getMessage.contains("all-pairs"))
      // raising the bound lets a deliberate run through
      spark.conf.set("spark.graft.allPairs.maxRows", "100")
      assert(ScaleGuards.requireAllPairsSafe(df, "q_test_baseline").count() === 100)
    } finally spark.conf.unset("spark.graft.allPairs.maxRows")
  }

  test("guarded baselines q34/q37/q39 refuse corpus-scale inputs but run at test scale") {
    // The guard is wired into the query fns themselves: with a tiny
    // bound set, building the query fails fast; with the default bound
    // the sf0.001 run is untouched.
    val d = "/root/testdata/sf0.001"
    spark.conf.set("spark.graft.allPairs.maxRows", "3")
    try {
      intercept[IllegalArgumentException] {
        graft.SparkEntry.queries("q37_cosine_topk")(spark, d)
      }
      intercept[IllegalArgumentException] {
        graft.SparkEntry.queries("q34_ngram_jaccard")(spark, d)
      }
      intercept[IllegalArgumentException] {
        graft.SparkEntry.queries("q39_neardup_pairs")(spark, d)
      }
    } finally spark.conf.unset("spark.graft.allPairs.maxRows")
    assert(graft.SparkEntry.queries("q37_cosine_topk")(spark, d).count() > 0)
  }
}
