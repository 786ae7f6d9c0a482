package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registerTables exposes the corpus to plain SQL with native functions") {
    GraftSession.registerTables(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT count(*) FROM lineitem").head().getLong(0)
    // the view must expose exactly the parquet's rows; the count itself
    // is the driver's to choose (TESTDATA.md says "~6,000" at sf0.001
    // and row counts can drift across refreshes)
    assert(n === Tables.load(spark, "/root/testdata/sf0.001", "lineitem").count())
    assert(n > 0L)
    // native function + view together
    val d = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d FROM embeddings ORDER BY vec_id LIMIT 1")
      .head().getDouble(0)
    assert(math.abs(d - 1.0) < 1e-3) // unit-normalized embeddings
    // events view carries the ts_us column for time math
    val h = spark.sql("SELECT count(DISTINCT ts_us div 3600000000) FROM events").head().getLong(0)
    assert(h > 0)
  }
}
