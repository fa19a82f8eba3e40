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
  * hashes) the density assumption fails — dictionary-encode first
  * (`CubeConfig.dictBitmaps` maintains the key → dense-id map as cube
  * state) or take the HLL path; this is the documented boundary, not a
  * silent degradation (state grows, correctness never changes).
  *
  * SECOND boundary — per-row blob size: one cell's bitmap is a single
  * binary value, ∝ the cell's touched id blocks. At ~10⁸ distinct
  * ids/day a daily partial is 10²-10³ MB, and a rolling serve that
  * explodes each day's blob ×windowDays shuffles multiples of that
  * into ONE reducer row per endpoint. The scale-safe layout is
  * `CubeConfig.bitmapShardBits`: cells subdivide by id block range
  * (`__bshard = id >> bits`), bounding every stored blob at
  * 4 + 16·(2^bits/64 + 1) bytes, and the rolling/retention serves
  * aggregate per shard first (cardinalities ADD across shards — they
  * partition the id space), so no merged blob ever materializes.
  * SCALING.md's `rolling_bitmap_serve` / `retention_bitmap_serve`
  * families measure the sharded serves flat under ×10 ids; CubeSpec
  * pins sharded == unsharded bit-identical with the blob bound
  * asserted.
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
  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] =
    BitmapCodec.write(buf)

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] =
    BitmapCodec.read(bytes)

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

/** INTERSECTION across rows of serialized bitmaps — the set-algebra
  * dual of [[BitmapAgg]]'s merge mode, and like it associative,
  * commutative and LOSSLESS: intersecting a window's daily bitmap
  * partials yields exactly the ids present on EVERY one of those days
  * (the "active every day of the trailing week" power-user curve),
  * with the merged cardinality EQUAL to a from-scratch recompute.
  *
  * AND has no finite identity element (the identity is the universe),
  * so the buffer carries an `inited` flag: the first bitmap seeds the
  * state, later ones AND in place, and partials from row-less
  * partitions merge as no-ops. A group with zero non-null inputs
  * evals to null (SQL aggregate convention); disjoint inputs eval to
  * the EMPTY bitmap (cardinality 0) — absence of evidence vs evidence
  * of absence stay distinguishable. Intersection only ever shrinks
  * state, so per-group memory is bounded by the FIRST bitmap seen and
  * the map-side combine shrinks monotonically from there. */
case class BitmapIntersectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapIntersectAgg.Buf]
  with ExpectsInputTypes {
  import BitmapIntersectAgg.Buf

  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def createAggregationBuffer(): Buf =
    new Buf(inited = false, mutable.LongMap.empty[Long])

  private def andInPlace(into: mutable.LongMap[Long],
      from: mutable.LongMap[Long]): Unit = {
    // materialize the key set first — removing while iterating a
    // LongMap is undefined
    val keys = into.keys.toArray
    var i = 0
    while (i < keys.length) {
      val k = keys(i)
      val w = into(k) & from.getOrElse(k, 0L)
      if (w == 0L) into.remove(k) else into.update(k, w)
      i += 1
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val m = BitmapCodec.read(v.asInstanceOf[Array[Byte]])
      if (!buf.inited) { buf.m = m; buf.inited = true }
      else andInPlace(buf.m, m)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    if (other.inited) {
      if (!buf.inited) { buf.m = other.m; buf.inited = true }
      else andInPlace(buf.m, other.m)
    }
    buf
  }

  override def eval(buf: Buf): Any =
    if (!buf.inited) null else BitmapCodec.write(buf.m)

  /** Uninitialized partials serialize as n = -1 — distinguishable from
    * the inited-but-empty bitmap (n = 0), which AND must preserve. */
  override def serialize(buf: Buf): Array[Byte] =
    if (!buf.inited)
      java.nio.ByteBuffer.allocate(4).putInt(-1).array()
    else BitmapCodec.write(buf.m)

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    if (bb.getInt(0) == -1) new Buf(inited = false, mutable.LongMap.empty)
    else new Buf(inited = true, BitmapCodec.read(bytes))
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bitmap_intersect_agg"

  override def withNewMutableAggBufferOffset(o: Int): BitmapIntersectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapIntersectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapIntersectAgg =
    copy(child = newChildren.head)
}

object BitmapIntersectAgg {
  final class Buf(var inited: Boolean, var m: mutable.LongMap[Long])
}

/** Shared (de)serialization for the bitmap byte form: `n` (Int) then
  * `n` ascending (block: Long, word: Long) pairs — a pure function of
  * the SET (see [[BitmapAgg.serialize]]), which the pairwise set-ops
  * below exploit as a no-allocation merge-walk. */
private[graft] object BitmapCodec {
  def read(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  def write(m: mutable.LongMap[Long]): Array[Byte] = {
    val blocks = m.keys.toArray
    java.util.Arrays.sort(blocks)
    val bb = java.nio.ByteBuffer.allocate(4 + blocks.length * 16)
    bb.putInt(blocks.length)
    blocks.foreach { b => bb.putLong(b); bb.putLong(m(b)) }
    bb.array()
  }

  /** Σ bitCount(aWord OP bWord) over the union of the two block lists,
    * walked in one pass off the sorted byte forms — no map is ever
    * materialized. `op(aWord, bWord)` sees 0 for a block absent on
    * either side. */
  def opCardinality(a: Array[Byte], b: Array[Byte],
      op: (Long, Long) => Long): Long = {
    val ba = java.nio.ByteBuffer.wrap(a)
    val bbuf = java.nio.ByteBuffer.wrap(b)
    val na = ba.getInt
    val nb = bbuf.getInt
    var ia = 0
    var ib = 0
    var total = 0L
    var ka = if (na > 0) ba.getLong else 0L
    var wa = if (na > 0) ba.getLong else 0L
    var kb = if (nb > 0) bbuf.getLong else 0L
    var wb = if (nb > 0) bbuf.getLong else 0L
    while (ia < na || ib < nb) {
      if (ia < na && (ib >= nb || ka < kb)) {
        total += java.lang.Long.bitCount(op(wa, 0L))
        ia += 1
        if (ia < na) { ka = ba.getLong; wa = ba.getLong }
      } else if (ib < nb && (ia >= na || kb < ka)) {
        total += java.lang.Long.bitCount(op(0L, wb))
        ib += 1
        if (ib < nb) { kb = bbuf.getLong; wb = bbuf.getLong }
      } else { // ka == kb, both live
        total += java.lang.Long.bitCount(op(wa, wb))
        ia += 1; ib += 1
        if (ia < na) { ka = ba.getLong; wa = ba.getLong }
        if (ib < nb) { kb = bbuf.getLong; wb = bbuf.getLong }
      }
    }
    total
  }
}

/** |A ∩ B| of two serialized bitmaps — the retention cell (users
  * active in period p who were also active in p−1) as one merge-walk
  * over the two sorted byte forms. Eval-only (CodegenFallback) by
  * design: runs over CUBE-sized frames (one row per served period),
  * never a corpus scan. */
case class BitmapAndCardinality(left: Expression, right: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bitmap_and_cardinality"
  override def children: Seq[Expression] = Seq(left, right)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else BitmapCodec.opCardinality(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], _ & _)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapAndCardinality =
    copy(left = newChildren(0), right = newChildren(1))
}

/** A ∩ B as SERIALIZED BYTES (not a cardinality) — the funnel-cascade
  * cell: step k's qualified-at-period-p set is B_k[p] ∩ C_{k−1}[p],
  * and that set must survive as a bitmap because the NEXT window pass
  * prefix-unions it into C_k. One merge-walk over the two sorted byte
  * forms, keeping only blocks live on BOTH sides with a nonzero AND —
  * the output is the same canonical sorted form, so downstream
  * union/cardinality/equality all hold. Eval-only like its cardinality
  * siblings: runs over cube-derived period frames, never a source. */
case class BitmapAndBytes(left: Expression, right: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bitmap_and"
  override def children: Seq[Expression] = Seq(left, right)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val ma = BitmapCodec.read(a.asInstanceOf[Array[Byte]])
      val mb = BitmapCodec.read(b.asInstanceOf[Array[Byte]])
      val out = mutable.LongMap.empty[Long]
      ma.foreach { case (block, wa) =>
        mb.get(block).foreach { wb =>
          val w = wa & wb
          if (w != 0L) out.update(block, w)
        }
      }
      BitmapCodec.write(out)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapAndBytes =
    copy(left = newChildren(0), right = newChildren(1))
}

/** A \ B as SERIALIZED BYTES — the cohort-triangle cell: a period's
  * NEW ids are its bitmap minus the prefix union of everything
  * earlier, and that set must survive as a bitmap because every later
  * period intersects against it (retained-at-offset-k). Canonical
  * sorted output like [[BitmapAndBytes]]; eval-only by design. */
case class BitmapAndNotBytes(left: Expression, right: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bitmap_andnot"
  override def children: Seq[Expression] = Seq(left, right)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val ma = BitmapCodec.read(a.asInstanceOf[Array[Byte]])
      val mb = BitmapCodec.read(b.asInstanceOf[Array[Byte]])
      val out = mutable.LongMap.empty[Long]
      ma.foreach { case (block, wa) =>
        val w = wa & ~mb.getOrElse(block, 0L)
        if (w != 0L) out.update(block, w)
      }
      BitmapCodec.write(out)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapAndNotBytes =
    copy(left = newChildren(0), right = newChildren(1))
}

/** |A \ B| — the churn cell (active in p−1 but gone in p) and the
  * new-users cell (active in p, unseen in p−1), same merge-walk. */
case class BitmapAndNotCardinality(left: Expression, right: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bitmap_andnot_cardinality"
  override def children: Seq[Expression] = Seq(left, right)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else BitmapCodec.opCardinality(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], (x, y) => x & ~y)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapAndNotCardinality =
    copy(left = newChildren(0), right = newChildren(1))
}

/** ACTIVITY-FREQUENCY counting over bitmap inputs — the aggregate
  * behind the exact L7/L28 "power-user curve" (q250): given one
  * serialized bitmap per row (a day's / period's active-id set), eval
  * yields an array `a` where `a(j-1)` = |ids present in exactly j of
  * the inputs| for j = 1..maxK-1 and `a(maxK-1)` = |ids present in
  * ≥ maxK inputs| (the saturating top bucket — callers that pass
  * maxK = the window's day count never saturate, because an id cannot
  * appear in more inputs than exist).
  *
  * The state is the PARTITION of the seen-id set by occurrence count:
  * maxK bitmaps N_1..N_maxK with N_j = ids seen in exactly j inputs so
  * far (N_maxK = "≥ maxK"). That makes the aggregate order-independent
  * (counting is commutative) and MERGEABLE: two partial partitions
  * combine by occurrence-count addition,
  *
  *   R_j = (A_j \ ∪B) ∪ (B_j \ ∪A) ∪ ⋃_{x+y=j} (A_x ∩ B_y)
  *
  * (with x+y ≥ maxK collapsing into the top bucket) — O(maxK²) bitmap
  * merge-walks per combine, maxK ≤ 28-ish by construction. Per-group
  * state is bounded by the seen-id set: the N_j partition it, so total
  * words across all maxK maps never exceed the plain union's words
  * (plus per-map block overhead). Runs over CUBE-sized frames (≤
  * windowDays one-row bitmaps per served endpoint), never a source
  * scan — the same contract as every bitmap serve. */
case class BitmapKCountAgg(
    child: Expression,
    maxK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[mutable.LongMap[Long]]]
  with ExpectsInputTypes {
  require(maxK >= 1, s"maxK must be >= 1, got $maxK")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def createAggregationBuffer(): Array[mutable.LongMap[Long]] =
    Array.fill(maxK)(mutable.LongMap.empty[Long])

  private def orInto(into: mutable.LongMap[Long],
      from: mutable.LongMap[Long]): Unit =
    from.foreach { case (k, w) =>
      into.update(k, into.getOrElse(k, 0L) | w)
    }

  private def andOf(a: mutable.LongMap[Long],
      b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    val out = mutable.LongMap.empty[Long]
    // walk the smaller side
    val (s, l) = if (a.size <= b.size) (a, b) else (b, a)
    s.foreach { case (k, w) =>
      val x = w & l.getOrElse(k, 0L)
      if (x != 0L) out.update(k, x)
    }
    out
  }

  private def andNotOf(a: mutable.LongMap[Long],
      b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    val out = mutable.LongMap.empty[Long]
    a.foreach { case (k, w) =>
      val x = w & ~b.getOrElse(k, 0L)
      if (x != 0L) out.update(k, x)
    }
    out
  }

  private def minusInPlace(into: mutable.LongMap[Long],
      b: mutable.LongMap[Long]): Unit = {
    // iterate the subtrahend's blocks only — removing while iterating
    // `into` is undefined, and b is typically the smaller side
    b.foreach { case (k, wb) =>
      into.get(k).foreach { w =>
        val x = w & ~wb
        if (x == 0L) into.remove(k) else into.update(k, x)
      }
    }
  }

  override def update(buf: Array[mutable.LongMap[Long]],
      input: InternalRow): Array[mutable.LongMap[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val bm = BitmapCodec.read(v.asInstanceOf[Array[Byte]])
      if (maxK == 1) orInto(buf(0), bm) // degenerate: "≥1" is the union
      else {
        // ids new to this group: bm minus everything seen so far
        val seen = mutable.LongMap.empty[Long]
        buf.foreach(orInto(seen, _))
        val newIds = andNotOf(bm, seen)
        // top bucket saturates: members already ≥ maxK stay put, and
        // N_{maxK-1} ∩ bm graduates in (captured before the loop
        // rewrites N_{maxK-1})
        val graduating = andOf(buf(maxK - 2), bm)
        // descend so each step reads its donor N_{j-1} pre-update
        var idx = maxK - 2
        while (idx >= 1) {
          val promoted = andOf(buf(idx - 1), bm)
          minusInPlace(buf(idx), bm)
          orInto(buf(idx), promoted)
          idx -= 1
        }
        minusInPlace(buf(0), bm)
        orInto(buf(0), newIds)
        orInto(buf(maxK - 1), graduating)
      }
    }
    buf
  }

  override def merge(buf: Array[mutable.LongMap[Long]],
      other: Array[mutable.LongMap[Long]]): Array[mutable.LongMap[Long]] = {
    if (other.forall(_.isEmpty)) return buf
    if (buf.forall(_.isEmpty)) {
      var i = 0
      while (i < maxK) { buf(i) = other(i); i += 1 }
      return buf
    }
    val unionA = mutable.LongMap.empty[Long]
    buf.foreach(orInto(unionA, _))
    val unionB = mutable.LongMap.empty[Long]
    other.foreach(orInto(unionB, _))
    val res = Array.fill(maxK)(mutable.LongMap.empty[Long])
    var j = 0
    while (j < maxK) {
      // ids counted on one side only keep their count
      orInto(res(j), andNotOf(buf(j), unionB))
      orInto(res(j), andNotOf(other(j), unionA))
      j += 1
    }
    // ids counted on both sides: occurrence counts ADD (saturating)
    var x = 1
    while (x <= maxK) {
      var y = 1
      while (y <= maxK) {
        val inter = andOf(buf(x - 1), other(y - 1))
        if (inter.nonEmpty)
          orInto(res(math.min(x + y, maxK) - 1), inter)
        y += 1
      }
      x += 1
    }
    var i = 0
    while (i < maxK) { buf(i) = res(i); i += 1 }
    buf
  }

  override def eval(buf: Array[mutable.LongMap[Long]]): Any = {
    val counts = new Array[Long](maxK)
    var i = 0
    while (i < maxK) {
      var t = 0L
      buf(i).foreach { case (_, w) => t += java.lang.Long.bitCount(w) }
      counts(i) = t
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  override def serialize(buf: Array[mutable.LongMap[Long]]): Array[Byte] = {
    var size = 0
    buf.foreach(m => size += 4 + m.size * 16)
    val bb = java.nio.ByteBuffer.allocate(size)
    buf.foreach { m =>
      val blocks = m.keys.toArray
      java.util.Arrays.sort(blocks)
      bb.putInt(blocks.length)
      blocks.foreach { b => bb.putLong(b); bb.putLong(m(b)) }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[mutable.LongMap[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(maxK) {
      val n = bb.getInt
      val m = mutable.LongMap.empty[Long]
      var i = 0
      while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
      m
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bitmap_kcount_agg"

  override def withNewMutableAggBufferOffset(o: Int): BitmapKCountAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapKCountAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapKCountAgg =
    copy(child = newChildren.head)
}

/** ALL set ids of a serialized bitmap as an array — the bridge from
  * blob algebra back to RELATIONAL rows (the [[WeightMapEntries]]
  * rationale for the count-distinct family): the round-18 cohort-matrix
  * serve explodes the cube's per-cell bitmaps once and answers the
  * whole (cohort × offset) triangle with plain aggregates over (id,
  * period) rows — linear in Σ|cell ids| (cube content, never the
  * source) where the former |periods|²/2 AND-cardinality pair walk was
  * quadratic in the period count and ran inside one task. Ids ascend
  * within and across blocks (the byte form is block-sorted), though no
  * consumer relies on it. Eval-only (CodegenFallback) like every blob
  * op — runs over cube-sized frames. */
case class BitmapIds(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bitmap_ids"

  override def nullSafeEval(bytes: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(bytes.asInstanceOf[Array[Byte]])
    val n = bb.getInt
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val block = bb.getLong
      var word = bb.getLong
      while (word != 0L) {
        val bit = java.lang.Long.numberOfTrailingZeros(word)
        out += block * 64L + bit
        word &= word - 1L
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BitmapIds = copy(child = newChild)
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

  /** Intersect serialized bitmaps across rows (lossless like union;
    * null over an all-null group, EMPTY bitmap when disjoint). */
  def intersectAgg(c: Column): Column =
    Bridge.toColumn(
      BitmapIntersectAgg(Bridge.toExpression(c)).toAggregateExpression())

  /** Occurrence-count histogram over serialized bitmap rows: element
    * j−1 = |ids present in exactly j inputs| (the last element
    * saturates to "≥ maxK"). */
  def kCountAgg(c: Column, maxK: Int): Column =
    Bridge.toColumn(
      BitmapKCountAgg(Bridge.toExpression(c), maxK).toAggregateExpression())

  /** Exact distinct count of a serialized bitmap column. */
  def cardinality(c: Column): Column =
    Bridge.toColumn(BitmapCardinality(Bridge.toExpression(c)))

  /** A ∩ B of two serialized bitmap columns, as serialized bytes. */
  def and(a: Column, b: Column): Column =
    Bridge.toColumn(BitmapAndBytes(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  /** A \ B of two serialized bitmap columns, as serialized bytes. */
  def andNot(a: Column, b: Column): Column =
    Bridge.toColumn(BitmapAndNotBytes(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Exact |A ∩ B| of two serialized bitmap columns. */
  def andCardinality(a: Column, b: Column): Column =
    Bridge.toColumn(BitmapAndCardinality(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Exact |A \ B| of two serialized bitmap columns. */
  def andNotCardinality(a: Column, b: Column): Column =
    Bridge.toColumn(BitmapAndNotCardinality(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  /** All set ids as an array — explode to get the set back as
    * relational rows (see [[BitmapIds]]). */
  def ids(c: Column): Column =
    Bridge.toColumn(BitmapIds(Bridge.toExpression(c)))
}
