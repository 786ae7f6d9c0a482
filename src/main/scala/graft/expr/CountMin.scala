package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native count-min sketch (Cormode & Muthukrishnan) — the fourth
  * `TypedImperativeAggregate` beside [[TopKPairs]], [[KmvDistinct]] and
  * [[SpaceSaving]]: point-query frequency estimation in O(d·w) memory
  * per group, whatever the input size. Complements space-saving: that
  * one answers "which items dominate", this one answers "how often is
  * item x" for ANY x, with the classic one-sided guarantee
  * `true ≤ est ≤ true + ε·n` (ε = e/w) with probability 1 − e^−d.
  *
  * Unlike most sketches, the counter table is a DETERMINISTIC function
  * of the multiset of inputs: update is `buf[r·w + g_r(item)] += 1` and
  * merge is element-wise addition, so any partitioning / merge order
  * yields bit-identical counters — which is why the gate query (q179)
  * can hash-match a DuckDB oracle that recomputes every bucket sum
  * relationally (no error-band gating needed, exact parity).
  *
  * Hash family: the repo-wide Carter–Wegman double-hash on one md5
  * ([[graft.ops.DedupOps]] scaladoc): `g_r = (h1 + r·h2) mod (2^61−1)
  * mod w` where h1/h2 are hex digits 1–15 / 17–31 of `md5(item)` — so
  * both Spark columns (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
  * (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`) can reproduce the
  * bucket index exactly. Depth is fixed at d = 4 rows.
  *
  * Result: `array<bigint>` of length d·w, row-major (`r·w + g`).
  */
case class CountMin(
    item: Expression,
    kExpr: Expression, // sketch width w (FoldableK naming contract)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with FoldableK {

  import CountMin.{Depth, Prime}

  private lazy val w: Int = kValue

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = checkK()

  override def children: Seq[Expression] = Seq(item, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val hex = CountMin.md5Hex(v.asInstanceOf[UTF8String].getBytes)
      val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(16, 31), 16)
      var r = 0
      while (r < Depth) {
        val g = ((h1 + r * h2) % Prime % w).toInt
        buf(r * w + g) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box).toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMin =
    copy(item = newChildren(0), kExpr = newChildren(1))
}

object CountMin {
  /** Fixed depth: 4 hash rows (failure probability e^−4 ≈ 1.8%). */
  val Depth: Int = 4
  /** 2^61 − 1, the Mersenne prime shared with [[graft.ops.DedupOps]]. */
  val Prime: Long = (1L << 61) - 1

  /** Point-query estimate against a sketch counter table — min over the
    * d bucket counters the item hashes to. Called from both
    * [[CmQuery]]'s interpreted eval and its GENERATED code (the Scala
    * static forwarder makes `graft.expr.CountMin.estimate(...)` a plain
    * static call in codegen'd Java).
    */
  def estimate(cm: org.apache.spark.sql.catalyst.util.ArrayData,
               item: UTF8String, w: Int): Long = {
    val hex = md5Hex(item.getBytes)
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(16, 31), 16)
    var est = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val g = ((h1 + r * h2) % Prime % w).toInt
      val v = cm.getLong(r * w + g)
      if (v < est) est = v
      r += 1
    }
    est
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Lower-case hex md5 of raw bytes — byte-identical to Spark's `md5()`
    * and DuckDB's `md5()` on the same UTF-8 string.
    */
  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

/** Scalar point-query against a count-min counter table:
  * `cm_query(cm, item, w)` = the sketch's frequency estimate for
  * `item` — the consumer-side half of the sketch API (the aggregate
  * builds the table, this probes it), with full whole-stage codegen
  * (one static call per row, no fallback). `w` must be the SAME
  * foldable width the table was built with; the d = 4 depth is the
  * class constant on both sides.
  */
case class CmQuery(
    cm: org.apache.spark.sql.catalyst.expressions.Expression,
    item: org.apache.spark.sql.catalyst.expressions.Expression,
    kExpr: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with FoldableK {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def first: Expression = cm
  override def second: Expression = item
  override def third: Expression = kExpr

  override def dataType: DataType = LongType
  override def prettyName: String = "cm_query"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = checkK()
    if (!base.isSuccess) base
    else if (cm.dataType != ArrayType(LongType, containsNull = false) &&
             cm.dataType != ArrayType(LongType, containsNull = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> sketch, got ${cm.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(c: Any, i: Any, w: Any): Any =
    CountMin.estimate(c.asInstanceOf[ArrayData], i.asInstanceOf[UTF8String],
      w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, i, w) =>
      s"${ev.value} = graft.expr.CountMin.estimate($c, $i, $w);")

  override protected def withNewChildrenInternal(
      newFirst: org.apache.spark.sql.catalyst.expressions.Expression,
      newSecond: org.apache.spark.sql.catalyst.expressions.Expression,
      newThird: org.apache.spark.sql.catalyst.expressions.Expression): CmQuery =
    copy(cm = newFirst, item = newSecond, kExpr = newThird)
}
