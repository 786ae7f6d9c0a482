package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global running sum — the two-phase (a.k.a. block-scan)
  * prefix sum. A naive `sum(v).over(Window.orderBy(o))` moves EVERY row
  * into one task (Spark plans Exchange SinglePartition + Sort); this
  * op keeps all row-scale work keyed:
  *
  *   1. within-bucket running sums — a window PARTITIONED by a caller-
  *      supplied bucket that is aligned with the global order (b1 < b2
  *      implies every row of b1 precedes every row of b2 — e.g. the
  *      hour of a timestamp, a shard of a monotone id);
  *   2. per-bucket totals (keyed aggregate) prefix-summed over the
  *      BUCKET-GRAIN frame — the only unpartitioned step, sized by the
  *      bucket domain (hours/shards: thousands at 100 TB), not by rows;
  *   3. broadcast the bucket offsets back and add.
  *
  * Result is bit-identical to the single-partition window whenever the
  * bucket respects the order (asserted nowhere — the caller owns the
  * alignment; `PrefixSumSpec` pins equivalence on adversarial data).
  */
object PrefixSum {

  /** Add `outCol` = running sum of `valueCol` over the global order
    * (`bucketCol` asc, then `orderCols`), with all row-scale shuffles
    * keyed on `bucketCol`. `bucketCol` must be numerically ordered
    * consistently with the intended global order.
    */
  def scalableRunningSum(
      df: DataFrame,
      bucketCol: String,
      orderCols: Seq[String],
      valueCol: String,
      outCol: String): DataFrame = {
    val within = Window.partitionBy(bucketCol)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // bucket-grain frame: |buckets| rows by construction — the one
    // deliberate unpartitioned window in the op (Audit exempts callers
    // by name after review)
    val offsets = df.groupBy(bucketCol)
      .agg(sum(col(valueCol)).as("__btot"))
      .withColumn("__offset",
        coalesce(
          sum(col("__btot")).over(
            Window.orderBy(bucketCol).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(bucketCol), col("__offset"))
    df.withColumn("__within", sum(col(valueCol)).over(within))
      .join(broadcast(offsets), Seq(bucketCol))
      .withColumn(outCol, col("__within") + col("__offset"))
      .drop("__within", "__offset")
  }

  /** Convenience: derive the bucket from an expression first. */
  def scalableRunningSum(
      df: DataFrame,
      bucket: Column,
      bucketName: String,
      orderCols: Seq[String],
      valueCol: String,
      outCol: String): DataFrame =
    scalableRunningSum(df.withColumn(bucketName, bucket),
      bucketName, orderCols, valueCol, outCol)
}
