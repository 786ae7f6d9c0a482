package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native space-saving heavy-hitters sketch (Metwally et al.; merge per
  * Agarwal et al. "Mergeable Summaries") — the third
  * `TypedImperativeAggregate` beside [[TopKPairs]] and [[KmvDistinct]],
  * closing the classic profiling-sketch trio: top pairs, distinct
  * count, item frequency. Per group it tracks at most `k` items, each
  * with an over-counted estimate and its error bound, so the shuffle
  * moves O(groups × k) entries whatever the input size — the
  * constant-memory way to find dominant tokens/domains/users in a
  * 100 TB corpus without a vocabulary-sized exact aggregation.
  *
  * Result: `array<struct<item, est, err>>` sorted (est desc, item asc),
  * at most k entries.
  *
  * Guarantees (n = stream length seen by the group):
  *  - fewer than k distinct inputs → EXACT counts, every `err` = 0
  *    (the mode q165 hash-gates strictly, mirroring q155's <k case);
  *  - otherwise, single-partition: `true ≤ est ≤ true + err`,
  *    `err ≤ n/k`, and any item with true count > n/k is present;
  *  - merged across partitions (merge sums counts/errors of the union
  *    then keeps the top k): absent-side occurrences can be dropped,
  *    so the two-sided bound relaxes to |est − true| ≤ n/k per level
  *    of merging. Unlike KMV's set-union, the merge is NOT
  *    order-independent — estimates may differ across partitionings
  *    WITHIN these bands (SpaceSavingSpec pins the bands under
  *    adversarial merge orders; only the <k mode is bit-stable, which
  *    is why only it is oracle-gated).
  */
case class SpaceSaving(
    item: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] with FoldableK {

  private lazy val k: Int = kValue

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = checkK()

  override def children: Seq[Expression] = Seq(item, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  /** Deterministic victim: smallest (count, err, item). */
  private def evictMin(buf: mutable.HashMap[String, (Long, Long)]): (String, (Long, Long)) =
    buf.minBy { case (it, (c, e)) => (c, e, it) }

  override def update(buf: mutable.HashMap[String, (Long, Long)], input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString // copies out of Spark's reused row
      buf.get(s) match {
        case Some((c, e)) => buf.update(s, (c + 1, e))
        case None if buf.size < k => buf.update(s, (1L, 0L))
        case None =>
          // classic space-saving step: the new item inherits the
          // victim's count as its over-estimate and error bound
          val (victim, (vc, _)) = evictMin(buf)
          buf.remove(victim)
          buf.update(s, (vc + 1, vc))
      }
    }
    buf
  }

  /** Mergeable-summaries combine: sum counts and errors over the union,
    * then truncate to the k largest by (count, err, item) — dropped
    * entries had count ≤ every survivor's.
    */
  override def merge(buf: mutable.HashMap[String, (Long, Long)], other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    other.foreach { case (it, (c, e)) =>
      val (c0, e0) = buf.getOrElse(it, (0L, 0L))
      buf.update(it, (c0 + c, e0 + e))
    }
    if (buf.size > k) {
      val keep = buf.toSeq
        .sortBy { case (it, (c, e)) => (-c, e, it) }
        .take(k)
      buf.clear()
      keep.foreach { case (it, ce) => buf.update(it, ce) }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val rows = buf.toSeq
      .sortBy { case (it, (c, _)) => (-c, it) }
      .map { case (it, (c, e)) =>
        InternalRow(UTF8String.fromString(it), c, e)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (it, (c, e)) =>
      out.writeUTF(it); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), (in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSaving =
    copy(item = newChildren(0), kExpr = newChildren(1))
}
