package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.IntegerType

/** Analysis-time validation for the sketch trio's capacity argument
  * (ADVICE round 8): `k` must be a foldable positive INT. Without this,
  * `heavy_hitters(item, 0)` (or a negative / null / per-row k) fails
  * deep inside `update()` — space-saving's evictMin on an empty map
  * throws NoSuchElementException — instead of at analysis time with a
  * message naming the argument.
  */
private[expr] trait FoldableK { self: Expression =>
  def kExpr: Expression

  protected def kValue: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  protected def checkK(): TypeCheckResult = {
    if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k to be a foldable INT literal, got ${kExpr.sql}")
    else {
      val v = kExpr.eval(InternalRow.empty)
      if (v == null || v.asInstanceOf[Int] <= 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires k > 0, got ${if (v == null) "NULL" else v}")
      else TypeCheckResult.TypeCheckSuccess
    }
  }
}
