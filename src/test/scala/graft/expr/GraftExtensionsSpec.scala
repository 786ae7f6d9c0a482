package graft.expr

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with GraftExtensions resolves the native functions without register()") {
    // force a genuinely NEW session (getOrCreate would return the shared
    // test session, silently skipping extension injection): clear the
    // global default + this thread's active session, restore after
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
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
      // the injected planner strategy plans AsOfJoinPlan with NO
      // imperative install() call (AsOfJoinOps.asofJoin installs, so
      // build the logical node directly — the conf-only deployment path)
      import spark.implicits._
      val probes = Seq((1L, 100L), (2L, 10L)).toDF("pid", "pt")
      val quotes = Seq((50L, "q1")).toDF("qt", "qn")
      val lPlan = probes.queryExecution.analyzed
      val rPlan = quotes.queryExecution.analyzed
      val asof = org.apache.spark.sql.GraftBridge.ofRows(spark,
        graft.plans.AsOfJoinPlan(lPlan, rPlan, Nil, Nil,
          lPlan.output.find(_.name == "pt").get, rPlan.output.find(_.name == "qt").get))
      val rows = asof.collect().map(r => (r.getLong(0), r.isNullAt(3))).toMap
      assert(rows === Map(1L -> false, 2L -> true))
    } finally {
      // don't stop the session (it shares the JVM's SparkContext);
      // restore the previous default/active so other suites are unaffected
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
