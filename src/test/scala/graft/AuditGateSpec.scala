package graft

import org.scalatest.funsuite.AnyFunSuite

/** Promotes `graft.Audit` from diagnostic to gate (round-9 verdict task
  * 5): every registered query's physical plan must carry zero
  * unexplained scale-killer flags — cartesians, BNL joins, sort
  * aggregates, unkeyed global windows — so a new query with a regressed
  * plan cannot land green. Deliberate shapes live in the curated
  * exception lists inside `Audit` with their justifications.
  */
class AuditGateSpec extends AnyFunSuite {

  // AQE must be off for plan-shape auditing (the adaptive wrapper hides
  // join selection / codegen spans from an unexecuted plan's toString);
  // newSession() keeps the shared context + graft extensions but gets
  // its own runtime conf.
  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  test("the detector fires red on an injected bad plan") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("a")
    val b = Seq(4, 5).toDF("b")
    val p = a.crossJoin(b).queryExecution.executedPlan.toString
    // a name outside the catalog gets no exemptions
    val flags = Audit.flagsFor("injected_bad_query", p)
    assert(flags.exists(f => f == "cartesian" || f == "bnl-join"),
      s"cross-join plan not flagged: $flags\n$p")

    val w = a.withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("a")))
    val pw = w.queryExecution.executedPlan.toString
    assert(Audit.flagsFor("injected_bad_query", pw).contains("global-window"),
      s"unkeyed window not flagged:\n$pw")
  }

  test("whole-catalog sweep: zero unexplained flags, zero planning errors") {
    val results = Audit.sweep(spark, "/root/testdata/sf0.001")
    assert(results.size === SparkEntry.queries.size)
    val flagged = results.filter(_.flags.nonEmpty)
    assert(flagged.isEmpty,
      "unexplained plan flags (deliberate shapes belong in Audit.expectedCross/expectedSortAgg):\n" +
        flagged.map(a => s"  ${a.name}: ${a.flags.mkString(", ")}").mkString("\n"))
  }
}
