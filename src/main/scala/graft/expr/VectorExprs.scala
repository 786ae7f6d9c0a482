package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding-similarity hot loop
  * (SURVEY.md §7.3 preference order: custom `Expression` with codegen
  * beats higher-order-function folds, which allocate an intermediate
  * array per row — at 4M pairs × 64 floats that allocation dominated the
  * profile).
  *
  * Semantics match the DuckDB oracle's
  * `list_dot_product(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))`:
  * each float widens exactly to double, products accumulate
  * left-to-right in a double.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration of graft's native expressions, so queries
  * can use them via `expr("vec_dot(a, b)")`. Idempotent.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Cast

  /** Builders shared by both registration paths; score/payload are cast
    * so SQL-literal arguments (e.g. DECIMAL `1.0`) just work.
    */
  private[expr] def vecDotBuilder(exprs: Seq[Expression]): Expression =
    FloatVecDot(exprs(0), exprs(1))
  private[expr] def topKBuilder(exprs: Seq[Expression]): Expression =
    TopKPairs(Cast(exprs(0), DoubleType), Cast(exprs(1), LongType), exprs(2))
      .toAggregateExpression()
  private[expr] def kmvBuilder(exprs: Seq[Expression]): Expression =
    KmvDistinct(Cast(exprs(0), LongType), exprs(1)).toAggregateExpression()
  private[expr] def heavyHittersBuilder(exprs: Seq[Expression]): Expression =
    SpaceSaving(Cast(exprs(0), StringType), exprs(1)).toAggregateExpression()
  private[expr] def countMinBuilder(exprs: Seq[Expression]): Expression =
    CountMin(Cast(exprs(0), StringType), exprs(1)).toAggregateExpression()
  private[expr] def cmQueryBuilder(exprs: Seq[Expression]): Expression =
    CmQuery(exprs(0), Cast(exprs(1), StringType), exprs(2))
  private[expr] def asofPickBuilder(exprs: Seq[Expression]): Expression =
    AsOfPick(exprs(0), exprs(1), exprs(2), exprs(3))
  private[expr] def jaroWinklerBuilder(exprs: Seq[Expression]): Expression =
    JaroWinkler(Cast(exprs(0), StringType), Cast(exprs(1), StringType))
  private[expr] def jaroWinklerBytesBuilder(exprs: Seq[Expression]): Expression =
    JaroWinklerBytes(Cast(exprs(0), StringType), Cast(exprs(1), StringType))
  // Spark's own runtime-filter expressions, exposed by name so
  // ops.BloomOps can plant the identical codegen'd probe explicitly.
  private[expr] def bloomAggBuilder(exprs: Seq[Expression]): Expression =
    new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)).toAggregateExpression()
  private[expr] def bloomContainsBuilder(exprs: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", vecDotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_pairs", topKBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct", kmvBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters", heavyHittersBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_min", countMinBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cm_query", cmQueryBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "asof_pick", asofPickBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", jaroWinklerBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler_bytes", jaroWinklerBytesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", bloomAggBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains", bloomContainsBuilder, "built-in")
  }
}

/** `SparkSessionExtensions` injection of the same functions — the
  * deployment-grade path: any session built with
  * `spark.sql.extensions=graft.expr.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) resolves `vec_dot` /
  * `top_k_pairs` with no imperative registration call.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => GraftFunctions.vecDotBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("top_k_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "top_k_pairs"),
      (exprs: Seq[Expression]) => GraftFunctions.topKBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      (exprs: Seq[Expression]) => GraftFunctions.kmvBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[SpaceSaving].getName, "heavy_hitters"),
      (exprs: Seq[Expression]) => GraftFunctions.heavyHittersBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[CountMin].getName, "count_min"),
      (exprs: Seq[Expression]) => GraftFunctions.countMinBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("asof_pick"),
      new ExpressionInfo(classOf[AsOfPick].getName, "asof_pick"),
      (exprs: Seq[Expression]) => GraftFunctions.asofPickBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("cm_query"),
      new ExpressionInfo(classOf[CmQuery].getName, "cm_query"),
      (exprs: Seq[Expression]) => GraftFunctions.cmQueryBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => GraftFunctions.jaroWinklerBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler_bytes"),
      new ExpressionInfo(classOf[JaroWinklerBytes].getName, "jaro_winkler_bytes"),
      (exprs: Seq[Expression]) => GraftFunctions.jaroWinklerBytesBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (exprs: Seq[Expression]) => GraftFunctions.bloomAggBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_contains"),
      (exprs: Seq[Expression]) => GraftFunctions.bloomContainsBuilder(exprs)))
    // conf-gated (spark.graft.rangeJoin.binWidth) range-join rewrite
    e.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    // physical planning for AsOfJoinPlan (graft.plans.AsOfJoinOps)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // post-EnsureRequirements shield insertion that lets AsOfJoinExec's
    // whole-stage codegen engage without costing its children their own
    // codegen stages (see AsOfInputExec's scaladoc)
    e.injectQueryStagePrepRule(_ => graft.plans.AsOfShieldRule)
  }
}
