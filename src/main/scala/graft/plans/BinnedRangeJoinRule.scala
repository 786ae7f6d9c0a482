package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a pure range θ-join into a binned
  * equi-join — the whole-plan form of q84's hand-written rewrite, and
  * the (c)-tier extension point of SURVEY.md §7.3 (a `Rule[LogicalPlan]`
  * where composing built-ins can't fix the PLAN even though it can fix
  * the ANSWER).
  *
  * Spark plans `A JOIN B ON a BETWEEN lo AND hi` (no equi-key) as a
  * BroadcastNestedLoopJoin — or a CartesianProduct when neither side
  * broadcasts — both of which die at cluster scale. With
  * `spark.graft.rangeJoin.binWidth = W` set, this rule rewrites the
  * matching join:
  *
  *   point side:  add `__graft_bin_p = a div W`
  *   bounds side: explode `sequence(lo div W, hi div W)` (W chosen near
  *                the typical interval width → ≤2 bins per row)
  *   join:        ON bin equality, original range kept as residual
  *
  * Truncating `div` is monotone non-decreasing for W > 0, so
  * a ∈ [lo, hi] implies the bins intersect: candidates are a superset
  * and the residual filter makes the rewrite EXACT for any sign, any
  * data. NULL bounds produce a NULL sequence → the Generate emits no
  * row, matching the original join's null semantics.
  *
  * Bin-count caveat: each bounds row explodes into
  * (hi - lo) / binWidth + 1 bins, so binWidth must be chosen near the
  * TYPICAL interval width (≤ a few bins per row). A pathological row
  * whose interval spans millions of bin widths fans out accordingly
  * (Spark's Sequence expression hard-fails past ~2^31 elements) —
  * pre-filter corrupt intervals or raise binWidth; the naïve plan,
  * while never faster, degrades smoothly where this rewrite amplifies
  * outlier rows.
  *
  * Matching is deliberately strict — Inner join, condition of exactly
  * two conjuncts forming one lower and one upper bound on the same
  * LongType point expression, point/bounds referencing opposite sides,
  * everything deterministic — and the rewritten join carries a third
  * (equality) conjunct, so the rule never re-fires on its own output.
  * The rule is inert unless the conf is set (> 0).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] {
  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  /** Imperative activation for an existing session (the deployment path
    * is `spark.sql.extensions=graft.expr.GraftExtensions`). Idempotent.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }

  private def binWidth: Option[Long] =
    try {
      val v = SQLConf.get.getConfString(BinWidthKey, "")
      if (v.isEmpty) None
      else {
        val w = v.toLong
        if (w <= 0) {
          logWarning(s"$BinWidthKey=$v is not positive; range-join rewrite disabled")
          None
        } else Some(w)
      }
    } catch {
      case _: NumberFormatException =>
        logWarning(s"$BinWidthKey is not a valid long; range-join rewrite disabled " +
          "(the range join will plan as a nested loop)")
        None
    }

  /** (point a, lower lo, upper hi) when `cond` is exactly a two-sided
    * range of a point expression from `pointPlan` bounded by
    * expressions from `boundsPlan`.
    */
  private def matchRange(cond: Expression, pointPlan: LogicalPlan,
                         boundsPlan: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def fromPoint(e: Expression) = e.references.subsetOf(pointPlan.outputSet) &&
      e.references.nonEmpty && e.deterministic && e.dataType == LongType
    def fromBounds(e: Expression) = e.references.subsetOf(boundsPlan.outputSet) &&
      e.references.nonEmpty && e.deterministic && e.dataType == LongType
    // normalize one conjunct to Some((a, bound, isLower)); a from point side
    def norm(c: Expression): Option[(Expression, Expression, Boolean)] = c match {
      case GreaterThanOrEqual(x, y) if fromPoint(x) && fromBounds(y) => Some((x, y, true))
      case GreaterThanOrEqual(x, y) if fromBounds(x) && fromPoint(y) => Some((y, x, false))
      case LessThanOrEqual(x, y) if fromPoint(x) && fromBounds(y) => Some((x, y, false))
      case LessThanOrEqual(x, y) if fromBounds(x) && fromPoint(y) => Some((y, x, true))
      case _ => None
    }
    cond match {
      case And(c1, c2) =>
        (norm(c1), norm(c2)) match {
          case (Some((a1, lo, true)), Some((a2, hi, false))) if a1.semanticEquals(a2) =>
            Some((a1, lo, hi))
          case (Some((a1, hi, false)), Some((a2, lo, true))) if a1.semanticEquals(a2) =>
            Some((a1, lo, hi))
          case _ => None
        }
      case _ => None
    }
  }

  private def div(e: Expression, w: Long): Expression =
    IntegralDivide(e, Literal(w))

  private def rewrite(j: Join, pointIsLeft: Boolean,
                      a: Expression, lo: Expression, hi: Expression, w: Long): LogicalPlan = {
    val (pointChild, boundsChild) = if (pointIsLeft) (j.left, j.right) else (j.right, j.left)
    val binP = Alias(div(a, w), "__graft_bin_p")()
    val newPoint = Project(pointChild.output :+ binP, pointChild)
    // guard inverted/NULL intervals: the naïve join matches nothing
    // there, but sequence(lo, hi, 1) with lo > hi THROWS — emit an
    // empty bin array instead (If on a NULL predicate takes the else
    // branch, so NULL bounds also fall through to no rows)
    val rawSeq = new Sequence(div(lo, w), div(hi, w), Literal(1L))
      .withTimeZone(SQLConf.get.sessionLocalTimeZone)
    val seqExpr = If(LessThanOrEqual(lo, hi), rawSeq,
      Literal.create(Array.empty[Long], org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
    val binB = AttributeReference("__graft_bin_b", LongType, nullable = false)()
    val newBounds = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binB), child = boundsChild)
    val (newLeft, newRight) = if (pointIsLeft) (newPoint, newBounds) else (newBounds, newPoint)
    val newCond = And(EqualTo(binP.toAttribute, binB), j.condition.get)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), _) =>
          matchRange(cond, left, right) match {
            case Some((a, lo, hi)) => rewrite(j, pointIsLeft = true, a, lo, hi, w)
            case None => matchRange(cond, right, left) match {
              case Some((a, lo, hi)) => rewrite(j, pointIsLeft = false, a, lo, hi, w)
              case None => j
            }
          }
      }
  }
}
