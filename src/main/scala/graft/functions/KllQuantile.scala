package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** KLL quantile sketch (datasketches-java, on the Spark classpath — the
  * same library behind Spark's hll_* functions) as a MERGEABLE cube
  * measure: a fixed-size summary of a value distribution whose union is
  * associative and commutative, so per-(dims) partials maintained by an
  * incremental cube can be rolled up to any dimension subset and asked
  * for percentiles — the thing an exact percentile cannot do from
  * pre-aggregated state (rank queries don't add across cells), and the
  * quantile sibling of the HLL distinct-count measure in
  * [[graft.cube.CubeManager]].
  *
  * The aggregate buffer is one sketch of ~k·(levels) doubles regardless
  * of input size, so partials shuffle O(k log n) bytes per group — at
  * 100 TB the alternative (exact percentile over raw values) shuffles
  * the corpus. Guarantee (classic KLL): rank error ≤ ~1.65% at k=200
  * with 99% confidence, independent of n and of merge order/shape.
  *
  * Estimates are rank-randomized by compaction (the published
  * algorithm), so queries over them are graded rows-only, with
  * rank-error-bound tests — the q119/q121 HLL discipline.
  */
case class KllDoublesAgg(
    child: Expression,
    k: Int,
    isMerge: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ExpectsInputTypes {

  // build mode eats raw doubles; merge mode eats serialized sketches
  override def inputTypes: Seq[DataType] =
    Seq(if (isMerge) BinaryType else DoubleType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      else buf.update(v.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapified sketches are read-only views; merging into a fresh
    // updatable heap instance keeps the buffer writable after shuffle
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String =
    if (isMerge) "kll_merge_agg" else "kll_sketch_agg"

  override def withNewMutableAggBufferOffset(o: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllDoublesAgg =
    copy(child = newChildren.head)
}

/** Quantile point-read from a serialized KLL sketch column. Eval-only
  * (CodegenFallback) by design: it runs over CUBE-sized frames (one
  * sketch per group), never in a corpus-scan hot path, and the heapify
  * cost is per-row-of-groups, not per-datum. */
case class KllQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  // ImplicitCast so a SQL rank literal (DECIMAL `0.5`) coerces to double
  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  // empty sketch (a group whose inputs were all null) reads as null
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sk: Any, q: Any): Any = {
    val s = KllDoublesSketch.heapify(Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null else s.getQuantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)
}

object Kll {
  /** Default k: ~1.65% normalized rank error at 99% confidence. */
  val K = 200

  /** Aggregate raw doubles into a serialized KLL sketch. */
  def sketchAgg(c: Column, k: Int = K): Column =
    Bridge.toColumn(
      KllDoublesAgg(Bridge.toExpression(c), k, isMerge = false)
        .toAggregateExpression())

  /** Merge serialized KLL sketches (associative + commutative union). */
  def mergeAgg(c: Column, k: Int = K): Column =
    Bridge.toColumn(
      KllDoublesAgg(Bridge.toExpression(c), k, isMerge = true)
        .toAggregateExpression())

  /** Read the value at normalized rank `q` (0..1) from a sketch column. */
  def quantile(sketch: Column, q: Double): Column =
    Bridge.toColumn(KllQuantileExpr(Bridge.toExpression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(q)))

  /** Worst-case normalized rank error of a k-sketch (two-sided, 99%). */
  def rankError(k: Int = K): Double =
    org.apache.datasketches.kll.KllSketch.getNormalizedRankError(k, false)
}
