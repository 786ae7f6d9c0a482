package graft.expr

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with GraftExtensions resolves the native functions without register()") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val d = spark.sql(
        "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .head().getDouble(0)
      assert(d === 11.0)
      val top = spark.sql(
        """SELECT inline(top_k_pairs(s, p, 2)) FROM VALUES (1.0, 10L), (3.0, 30L), (2.0, 20L) AS t(s, p)""")
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
      assert(top === Seq((3.0, 30L), (2.0, 20L)))
    } finally {
      // don't stop: shared JVM — other suites hold the default session
    }
  }
}
