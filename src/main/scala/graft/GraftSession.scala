package graft

import org.apache.spark.sql.SparkSession

import graft.expr.GraftFunctions

/** Library entry point for interactive / programmatic use: one call
  * yields a session with the engine's required configs (ns-timestamp
  * reads, UTC, AQE, R-like non-ANSI semantics — see
  * [[Tables.sessionConfigs]]) and its native functions (`vec_dot`,
  * `top_k_pairs`) registered. `registerTables` exposes the testdata as
  * SQL views so `spark.sql("SELECT ... FROM lineitem")` works directly.
  */
object GraftSession {

  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    GraftFunctions.register(spark)
    graft.plans.BinnedRangeJoinRule.install(spark)   // inert until binWidth conf set
    graft.plans.AsOfJoinOps.install(spark)
    spark
  }

  /** Register every testdata table as a temp view named after itself. */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    GraftFunctions.register(spark)
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, sfDir) else Tables.load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
  }
}
