package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary-search pick for the broadcast as-of join
  * (`plans/AsOfJoin.asofJoinBroadcast`): given a time-sorted array of
  * quote structs (time field FIRST; physically a long — TimestampType
  * micros or LongType) and a probe time `t`, returns the as-of matched
  * struct, or NULL when no quote is on the required side of `t`.
  *
  * Replaces the `filter(__qarr, pred)` + `element_at(±1)` composition,
  * which evaluates an interpreted lambda over EVERY array element for
  * EVERY probe row — O(|probe| × |quotes|) element evals, with the
  * ArrayFilter itself off the codegen path. The round-13 honest
  * re-measure caught that cost the moment the bench's toRdd forcing
  * actually executed the join (the prior count() forcing had eliminated
  * it): time-disjoint scaledata grows the per-key quote array with the
  * SF decade (~7.2k hourly quotes at sf1, ~72k at sf10), so the linear
  * scan made q124 quadratic in the decade. Binary search is O(log n)
  * per probe row and codegens to a tight loop over the unsafe array.
  *
  * Pick semantics (identical to the replaced composition):
  *   backward (forward=false): LAST  element with time <= t (< if strict)
  *   forward  (forward=true):  FIRST element with time >= t (> if strict)
  * Ties in time resolve to the same element `sort_array` + `element_at`
  * picked: the search is a pure upper/lower bound on the time field, and
  * sort_array's struct comparison orders time ties by the remaining
  * fields, so bound−1 (backward) / bound (forward) are exactly the last /
  * first tied elements. Quote times must be non-null (the operator drops
  * null-time quotes before collecting — a null cannot match either way,
  * and nulls-first struct ordering would break the search invariant).
  * Direct SQL callers violating that precondition get NULL only when the
  * binary search PROBES the offending element (the eval guard) — a null
  * element/time off the O(log n) probe path yields an arbitrary pick,
  * like any other precondition-violating misordered array; guaranteeing
  * NULL for any null anywhere would need the O(n) scan this expression
  * exists to avoid.
  */
case class AsOfPick(arr: Expression, t: Expression,
                    forwardExpr: Expression, strictExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(arr, t, forwardExpr, strictExpr)
  override def nullable: Boolean = true
  override def foldable: Boolean = arr.foldable && t.foldable
  override def prettyName: String = "asof_pick"

  // dataType can be requested during analysis BEFORE checkInputDataTypes
  // runs (round-13 ADVICE): fall back to a placeholder on a non-conforming
  // first argument so the clean TypeCheckFailure is the error users see,
  // not a ClassCastException out of this cast.
  private def elemType: StructType = arr.dataType match {
    case ArrayType(st: StructType, _) => st
    case _ => StructType(Nil)
  }
  override def dataType: DataType = elemType
  private def numFields: Int = elemType.fields.length

  private def flag(e: Expression): Boolean =
    e.eval(InternalRow.empty).asInstanceOf[Boolean]
  private lazy val forward = flag(forwardExpr)
  private lazy val strict = flag(strictExpr)
  // upper bound (first index with time > t) when backward+inclusive or
  // forward+strict; lower bound (first index with time >= t) otherwise
  private lazy val useLE = forward == strict

  override def checkInputDataTypes(): TypeCheckResult = {
    def isTimeLike(dt: DataType): Boolean =
      dt == LongType || dt.isInstanceOf[TimestampType] || dt.isInstanceOf[TimestampNTZType]
    arr.dataType match {
      case ArrayType(st: StructType, _) if st.fields.nonEmpty =>
        if (!isTimeLike(st.fields.head.dataType))
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: array element's FIRST field must be the quote time " +
              s"(LONG or TIMESTAMP), got ${st.fields.head.dataType.sql}")
        // the probe must be the SAME type as the quote time, not merely
        // long-backed (round-13 ADVICE): a raw LONG probed against
        // TIMESTAMP micros compares different clocks and is silently
        // wrong — the operator always passes matching sides
        else if (t.dataType != st.fields.head.dataType)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: probe time type ${t.dataType.sql} must match the " +
              s"quote time type ${st.fields.head.dataType.sql} exactly " +
              "(micros vs raw longs would compare different clocks)")
        else if (!(forwardExpr.foldable && forwardExpr.dataType == BooleanType &&
            strictExpr.foldable && strictExpr.dataType == BooleanType))
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: forward/strict must be foldable BOOLEAN literals")
        else TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: first argument must be ARRAY<STRUCT<...>>, got ${other.sql}")
    }
  }

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    if (a == null) return null
    val tv = t.eval(input)
    if (tv == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val tl = tv.asInstanceOf[Long]
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      // null elements / null time fields break the sorted-array invariant
      // the search needs (the operator drops them before collecting);
      // a direct SQL caller handing one in gets NULL, not an NPE
      // (round-13 ADVICE — the ElementAt posture). PATH-DEPENDENT by
      // design: the guard fires only when the binary search PROBES the
      // null — a null off the probe path already violated the sorted
      // precondition, and the pick is then whatever the search's O(log n)
      // probes saw, exactly like a misordered (non-null) array. The
      // guarantee is "no NPE, NULL when the violation is observed",
      // not "NULL for any null anywhere" — that would cost the O(n) scan
      // the expression exists to avoid (round-14 ADVICE).
      if (ad.isNullAt(mid)) return null
      val ms = ad.getStruct(mid, numFields)
      if (ms.isNullAt(0)) return null
      val mt = ms.getLong(0)
      if (if (useLE) mt <= tl else mt < tl) lo = mid + 1 else hi = mid
    }
    val idx = if (forward) lo else lo - 1
    // like ElementAt, the returned struct is a view into the array data
    if (idx < 0 || idx >= n || ad.isNullAt(idx)) null else ad.getStruct(idx, numFields)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGen = arr.genCode(ctx)
    val tGen = t.genCode(ctx)
    val n = ctx.freshName("n")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val mt = ctx.freshName("mt")
    val ms = ctx.freshName("ms")
    val bad = ctx.freshName("bad")
    val idx = ctx.freshName("idx")
    val cmp = if (useLE) "<=" else "<"
    val idxExpr = if (forward) lo else s"$lo - 1"
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${aGen.code}
        ${tGen.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${aGen.isNull} && !${tGen.isNull}) {
          final int $n = ${aGen.value}.numElements();
          int $lo = 0;
          int $hi = $n;
          boolean $bad = false;
          while ($lo < $hi) {
            final int $mid = ($lo + $hi) >>> 1;
            if (${aGen.value}.isNullAt($mid)) { $bad = true; break; }
            final org.apache.spark.sql.catalyst.InternalRow $ms =
              ${aGen.value}.getStruct($mid, $numFields);
            if ($ms.isNullAt(0)) { $bad = true; break; }
            final long $mt = $ms.getLong(0);
            if ($mt $cmp ${tGen.value}) { $lo = $mid + 1; } else { $hi = $mid; }
          }
          final int $idx = $idxExpr;
          if (!$bad && $idx >= 0 && $idx < $n && !${aGen.value}.isNullAt($idx)) {
            ${ev.isNull} = false;
            ${ev.value} = ${aGen.value}.getStruct($idx, $numFields);
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfPick =
    copy(arr = newChildren(0), t = newChildren(1),
      forwardExpr = newChildren(2), strictExpr = newChildren(3))
}
