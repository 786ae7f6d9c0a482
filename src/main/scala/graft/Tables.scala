package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet test tables (TESTDATA.md).
  *
  * All tables load as plain parquet scans so Catalyst keeps predicate
  * pushdown and column pruning (SURVEY.md §4). `events.ts` is written as
  * parquet TIMESTAMP(NANOS), which Spark only reads with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set in [[Verify]] /
  * [[Bench]] / test sessions); [[events]] then exposes it as `ts_ns`
  * (epoch nanoseconds, LongType) so query math stays exact integer
  * arithmetic — identical to DuckDB's `epoch_ns(ts)`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events` with `ts` (nanos long, via nanosAsLong) renamed to `ts_ns`,
    * plus `ts_us` truncated to microseconds — DuckDB reads the same
    * parquet as TIMESTAMP (μs, ns truncated), so oracle-checked queries
    * must do their time math on `ts_us` (`epoch_us(ts)` on the DuckDB
    * side).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns div 1000"))
  }

  /** Required session settings for reading the driver testdata. */
  def sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // The reference's R semantics are permissive (NaN-guards, NA casts —
    // SURVEY.md §2.I4/I10); ANSI hard-errors would change behavior.
    // Division-by-zero is still guarded explicitly in each query for
    // DuckDB parity (DuckDB: double x/0 → NULL; Java: ±Inf).
    "spark.sql.ansi.enabled" -> "false",
    // The streaming harness queries are sentinel-driven by design: every
    // watermark-gated emission (q74 session close, q123 outer-join
    // release) is forced by a far-future sentinel ROW riding a real
    // batch, never by the no-data micro-batch race (see q123's flush
    // protocol). No-data batches therefore only add cost here — each one
    // replays the full stateful plan for zero rows (measured: ~0.7 s per
    // batch on the stream-stream outer join, 2 of q123's 4 batches).
    // Unbounded production streams SHOULD leave this on (it is how idle
    // streams emit on watermark advance); this is the bounded-replay
    // harness session.
    "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")
}
