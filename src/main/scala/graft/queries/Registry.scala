package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark DataFrame program over the driver's
  * parquet tables plus (optionally) an equivalent DuckDB SQL oracle the
  * driver hash-compares against (SparkEntry contract).
  *
  * Oracle parity rules used throughout (so Spark and DuckDB agree
  * bit-for-bit):
  *  - sums/avgs of doubles go through DECIMAL(18,2) casts (exact,
  *    order-independent) and back to DOUBLE;
  *  - transcendental math (trig/exp/pow) is rounded to 6 decimals —
  *    JVM and libm may differ in the last ulp;
  *  - extracted integers (year, substring-casts) are cast to BIGINT to
  *    match DuckDB's default integer width;
  *  - every query ends in an explicit ORDER BY on a unique key.
  */
final case class NamedQuery(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryModule {
  def queries: Seq[(String, NamedQuery)]

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.sum
  import org.apache.spark.sql.types.DecimalType

  /** The exact-decimal sum idiom from the parity rules above, shared so
    * the recipe has ONE spelling: DECIMAL(18,2) per-term cast (exact,
    * order-independent across any partitioning), decimal SUM, back to
    * DOUBLE. DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  protected def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  protected def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
