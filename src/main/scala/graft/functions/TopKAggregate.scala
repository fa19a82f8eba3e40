package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as a TypedImperativeAggregate — the scale-correct way
  * to compute "top k per group".
  *
  * The window-function form (`row_number() over (partition … order …)
  * <= k`) must SORT every partition's full row set; this aggregate
  * carries at most k (value, id) pairs per group through the normal
  * partial/final aggregation path, so shuffle volume is k·|groups|
  * regardless of input size, and no sort larger than k ever happens.
  * Ordering: value desc, id asc tie-break (deterministic, matching the
  * window-rewrite oracle).
  *
  * Buffer is a bounded min-heap; serialize/deserialize make it
  * spill/shuffle-safe between partial and final aggregation.
  */
case class TopKByValue(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // min-heap: the WORST kept element on top ⇒ ordering reversed vs
  // result order (value desc, id asc): worst = smallest value, then
  // largest id
  private val heapOrd: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, i) => (-v, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](heapOrd)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) {
      insert(buf, (v.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (heapOrd.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
    // NB heapOrd "less" == better (sorts first in result order)
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sorted(heapOrd)
    new GenericArrayData(sorted.map { case (v, i) =>
      InternalRow(v, i)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, i) => out.writeDouble(v); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ => buf.enqueue((in.readDouble(), in.readLong())) }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(value, id)
  override def prettyName: String = "top_k_by_value"

  override def withNewMutableAggBufferOffset(offset: Int): TopKByValue =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByValue =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByValue =
    copy(value = newChildren(0), id = newChildren(1))
}

object TopKAggregate {
  /** top_k_by_value(value, id, k): array<struct<value, id>> ordered by
    * value desc, id asc. value must be double, id long. */
  def topK(value: Column, id: Column, k: Int): Column =
    Bridge.toColumn(
      TopKByValue(Bridge.toExpression(value), Bridge.toExpression(id), k)
        .toAggregateExpression())
}
