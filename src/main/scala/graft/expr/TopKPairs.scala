package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native top-k aggregate: per group, keep the k (score, payload) pairs
  * with the highest score (ties broken by smallest payload), returned
  * sorted. Replaces the sort-the-whole-partition `row_number()` window
  * pattern for top-k over large fan-outs (SURVEY.md §7.3(b)): partial
  * buffers hold ≤ k entries, so the shuffle moves O(groups × k) rows
  * instead of sorting O(pairs) — the difference between sorting 4M
  * mirrored cosine pairs and shuffling 2000×3 partials in q37.
  *
  * Semantics match `row_number() OVER (PARTITION BY g ORDER BY score
  * DESC, payload ASC) <= k` exactly, so the DuckDB oracle is unchanged.
  */
case class TopKPairs(
    score: Expression,
    payload: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] with FoldableK {

  private lazy val k: Int = kValue

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = checkK()

  override def children: Seq[Expression] = Seq(score, payload, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("payload", LongType))))
  override def prettyName: String = "top_k_pairs"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  /** true if a ranks strictly better than b: higher score, then smaller
    * payload. Score order is Spark's SORT order for doubles, not IEEE
    * `>`: NaN is LARGEST (so `score DESC` ranks a NaN cosine first, all
    * NaNs tying through to the payload) and -0.0 ties 0.0. IEEE `>`/`==`
    * are false for NaN, which would silently DROP NaN scores here while
    * both the row_number window and the DuckDB oracle rank them first —
    * a zero-norm embedding would diverge engine vs oracle (round-14
    * ADVICE). Double.compare gives the NaN-largest total order but
    * splits -0.0 < 0.0, so signed zero is folded first.
    */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val cmp = java.lang.Double.compare(sortKey(a._1), sortKey(b._1))
    cmp > 0 || (cmp == 0 && a._2 < b._2)
  }

  /** Fold -0.0 into 0.0 (Spark normalizes signed zero in sort keys). */
  private def sortKey(d: Double): Double = if (d == 0.0) 0.0 else d

  /** insert keeping buffer sorted best-first, capped at k. */
  private def insert(buf: ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.length == k && !better(e, buf.last)) return
    var i = buf.length
    while (i > 0 && better(e, buf(i - 1))) i -= 1
    buf.insert(i, e)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      insert(buf, (s.asInstanceOf[Double], p.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (s, p) => InternalRow(s, p) }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, p) => out.writeDouble(s); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), payload = newChildren(1), kExpr = newChildren(2))
}
