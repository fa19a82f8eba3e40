package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, MathContext}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Element-wise mean of a float-vector column as a
  * TypedImperativeAggregate — the scale-correct way to compute embedding
  * centroids.
  *
  * The composable form (posexplode → groupBy(key, pos) → avg → re-pack)
  * multiplies shuffle volume by the vector dimension: n vectors become
  * n×dim rows on the wire. This aggregate accumulates one dim-length
  * buffer per group with ordinary map-side partials, so the shuffle
  * carries |groups|×|partitions| buffers regardless of input size.
  *
  * Sums accumulate as exact BigDecimals (`new BigDecimal(double)` is the
  * exact binary value of each float32 input), so the result is
  * order-independent under any partitioning/AQE plan — the same
  * determinism discipline as the engine's DECIMAL money sums. The mean
  * divides once at eval (DECIMAL64) and rounds to float.
  */
case class VecMeanFloat(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanFloat.Buffer] {

  override def createAggregationBuffer(): VecMeanFloat.Buffer =
    new VecMeanFloat.Buffer(null, 0L)

  override def update(buf: VecMeanFloat.Buffer, input: InternalRow): VecMeanFloat.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) {
        buf.sums = Array.fill(n)(JBigDecimal.ZERO)
      }
      // dimension mismatch is a data bug the aggregate must surface, not
      // clamp: a silent prefix-sum would divide by the full count
      if (n != buf.sums.length)
        throw new IllegalArgumentException(
          s"vec_mean_float: vector of dim $n in a group of dim ${buf.sums.length}")
      var i = 0
      while (i < n) {
        buf.sums(i) = buf.sums(i).add(new JBigDecimal(arr.getFloat(i).toDouble))
        i += 1
      }
      buf.count += 1
    }
    buf
  }

  override def merge(buf: VecMeanFloat.Buffer, other: VecMeanFloat.Buffer): VecMeanFloat.Buffer = {
    if (other.sums != null) {
      if (buf.sums == null) {
        buf.sums = other.sums.clone()
        buf.count = other.count
      } else {
        if (buf.sums.length != other.sums.length)
          throw new IllegalArgumentException(
            s"vec_mean_float: merging buffers of dim ${other.sums.length} " +
              s"and ${buf.sums.length}")
        var i = 0
        while (i < buf.sums.length) {
          buf.sums(i) = buf.sums(i).add(other.sums(i)); i += 1
        }
        buf.count += other.count
      }
    }
    buf
  }

  override def eval(buf: VecMeanFloat.Buffer): Any = {
    if (buf.sums == null || buf.count == 0) return null
    val cnt = new JBigDecimal(buf.count)
    new GenericArrayData(buf.sums.map(s =>
      s.divide(cnt, MathContext.DECIMAL64).floatValue()))
  }

  override def serialize(buf: VecMeanFloat.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      buf.sums.foreach(s => out.writeUTF(s.toString)) // exact roundtrip
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecMeanFloat.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    val sums = if (n < 0) null
      else Array.fill(n)(new JBigDecimal(in.readUTF()))
    new VecMeanFloat.Buffer(sums, count)
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "vec_mean_float"

  override def withNewMutableAggBufferOffset(offset: Int): VecMeanFloat =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecMeanFloat =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecMeanFloat =
    copy(child = newChildren(0))
}

object VecMeanFloat {
  final class Buffer(var sums: Array[JBigDecimal], var count: Long)

  /** vec_mean_float(arr): element-wise mean of array<float>, exact
    * (order-independent) accumulation, float result. */
  def vecMean(arr: Column): Column =
    Bridge.toColumn(
      VecMeanFloat(Bridge.toExpression(arr)).toAggregateExpression())
}
