package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Native KMV (k-minimum-values) distinct-count sketch: per group, keep
  * the k smallest DISTINCT hash values of the input; the classic
  * estimator D̂ = (k−1)/v_k (v_k = the k-th smallest hash, normalized to
  * (0,1]) then estimates the distinct count with relative standard
  * error ≈ 1/√(k−2). The second `TypedImperativeAggregate` beside
  * [[TopKPairs]] (SURVEY.md §7.3(b)): partial buffers hold ≤ k longs,
  * so the shuffle moves O(groups × k) fixed-width values — constant
  * memory per group at any input size, and MERGEABLE (set-union + trim)
  * so map-side partials combine exactly like any native agg.
  *
  * Two properties make it oracle-able where other sketches are not:
  * the buffer is a SET of the k smallest values, so the result is
  * fully ORDER-INDEPENDENT (same answer under any partitioning — a
  * KLL/GK sketch's compaction is not), and with fewer than k distinct
  * inputs the sketch IS the exact distinct count. Callers feed an
  * already-hashed LONG column (e.g. the md5-prefix idiom used
  * throughout the dedup family) uniform on [0, 2^60) — the estimator
  * normalizes by 2^60.
  */
case class KmvDistinct(
    hash: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] with FoldableK {

  private lazy val k: Int = kValue

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = checkK()
  private val norm: Double = math.pow(2.0, 60)

  override def children: Seq[Expression] = Seq(hash, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) { buf += h; () }
    else if (h < buf.last && !buf.contains(h)) { buf += h; buf -= buf.last; () }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val h = hash.eval(input)
    if (h != null) insert(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  /** < k distinct values seen → the buffer holds ALL of them (exact);
    * otherwise the KMV estimator on the k-th minimum.
    */
  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble / (buf.last.toDouble / norm)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(hash = newChildren(0), kExpr = newChildren(1))
}
