package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B1 + quirk Q1 (Tutorial.R:24-26; duplicated at 125-127 — the reference
  * applies the flip twice, un-flipping `left` plays; we pin the intended
  * once-only semantics, SURVEY.md §2.M Q1).
  */
object Standardize {

  val FieldLength = 120.0
  val FieldWidth = 160.0 / 3.0

  /** Standardize tracking coordinates so offense always moves toward
    * increasing x: mirror both axes for `playDirection == "left"` plays.
    */
  def directionStandardize(df: DataFrame): DataFrame =
    df.withColumn("x",
        when(col("playDirection") === "left", lit(FieldLength) - col("x")).otherwise(col("x")))
      .withColumn("y",
        when(col("playDirection") === "left", lit(FieldWidth) - col("y")).otherwise(col("y")))
}
