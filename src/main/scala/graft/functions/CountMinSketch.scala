package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Stable._

/** Count-Min sketch: fixed-size frequency summary of an unbounded key
  * domain — d×w counters instead of |distinct keys| state.
  *
  * The aggregate buffer is one long array regardless of input size, so
  * the partial/final aggregation path shuffles d·w longs PER PARTITION
  * (not per key), and merge is element-wise addition — the sketch the
  * streaming/1000-executor shape wants when exact per-key counts would
  * OOM the state store. Guarantees (classic): estimate ≥ true count,
  * and ≤ true + (e/w)·N with probability 1−(1/e)^d over the hash draw.
  *
  * Row r hashes key k as xxhash64(r.toString ‖ k) with Spark's default
  * seed — EXACTLY the composable column expression
  * `xxhash64(concat(lit(r.toString), key))`, so [[CountMinSketch
  * .estimate]] can be pure built-in Column arithmetic over the
  * sketch array (no second custom expression, stays in codegen).
  */
case class CountMinSketchAgg(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes {

  // update() reads the key as UTF8String, so declare it: a non-string
  // key now fails analysis instead of throwing ClassCastException
  // mid-job. Deliberately NOT ImplicitCastInputTypes — a silent
  // int→string cast would change the hashed bytes; callers spell the
  // cast so sketch() and estimate() agree on the key's text form.
  // (Seq[DataType] is a covariant refinement of the declared
  // Seq[AbstractDataType] — AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].getBytes
      var r = 0
      while (r < d) {
        buf(r * w + CountMinSketch.slot(key, r, w)) += 1L
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

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(bytes.length / 8)(in.readLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "count_min_sketch_agg"

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = newChildren.head)
}

/** Mutable buffer of [[ApproxTopKAgg]]: a CMS counter array plus a
  * bounded candidate map (key → last CMS estimate). Keys are
  * UTF8String, NOT String: the hashed bytes must survive the round
  * trip exactly — `toString` replaces invalid UTF-8 sequences with
  * U+FFFD, which would re-derive different bytes at merge/eval and
  * read counter slots the key was never hashed into. */
final class ApproxTopKState(
    val counts: Array[Long],
    val cands: java.util.HashMap[UTF8String, Long])

/** GROUPED heavy hitters in ONE aggregate: a Count-Min sketch (bounded
  * frequency summary) fused with a bounded candidate heap (the
  * TopKAggregate discipline), so `groupBy(g).agg(approxTopK(key, k))`
  * ships d·w counters + ≤C candidates per group through the shuffle —
  * never |distinct keys| state, which is what an exact per-group top-k
  * (full count aggregate + window rank) carries and what OOMs at
  * 100 TB on an unbounded key domain.
  *
  * Candidate discipline: every partial keeps the top C = 4k keys by
  * their CMS estimate AT INSERT TIME; merge sums the counter arrays,
  * re-estimates the UNION of both candidate sets against the merged
  * counters, and re-trims to C. The 4k margin absorbs partition-local
  * ranking noise (a globally heavy key that is only rank ~3k in one
  * partition still survives to the merge). Reported estimates come
  * from the final merged sketch, so the classic CMS guarantee holds
  * per reported key: est ≥ true count, est ≤ true + (e/w)·N w.h.p.
  * The candidate SET is heuristic (order-dependent at the margin) —
  * the standard sketch top-k contract, graded rows-only with
  * est≥truth and recall-of-true-heavy tests. */
case class ApproxTopKAgg(
    child: Expression,
    d: Int,
    w: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ApproxTopKState]
  with ExpectsInputTypes {

  private val cap = 4 * k

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): ApproxTopKState =
    new ApproxTopKState(new Array[Long](d * w),
      new java.util.HashMap[UTF8String, Long](cap * 2))

  private def estimate(counts: Array[Long], key: Array[Byte]): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = counts(r * w + CountMinSketch.slot(key, r, w))
      if (c < est) est = c
      r += 1
    }
    est
  }

  private def sorted(st: ApproxTopKState):
      java.util.ArrayList[java.util.Map.Entry[UTF8String, Long]] = {
    val entries = new java.util.ArrayList(st.cands.entrySet())
    // highest estimate first; key ties broken by binary order for
    // stability
    entries.sort { (a: java.util.Map.Entry[UTF8String, Long],
        b: java.util.Map.Entry[UTF8String, Long]) =>
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    entries
  }

  /** Refresh every candidate's estimate against the CURRENT counters.
    * Called before any sort/cut: a candidate's stored value is its
    * estimate at its own last insert, which goes stale as later keys
    * bump shared slots — cutting on stale values can keep the wrong
    * keys (no-merge paths like window evaluation never pass through
    * merge(), so eval() must not rely on merge having refreshed). */
  private def reestimate(st: ApproxTopKState): Unit = {
    val it = st.cands.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      e.setValue(estimate(st.counts, e.getKey.getBytes))
    }
  }

  private def trim(st: ApproxTopKState, to: Int): Unit =
    if (st.cands.size > to) {
      val entries = sorted(st)
      st.cands.clear()
      var i = 0
      while (i < to) {
        val e = entries.get(i)
        st.cands.put(e.getKey, e.getValue)
        i += 1
      }
    }

  override def update(st: ApproxTopKState, input: InternalRow): ApproxTopKState = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      val bytes = key.getBytes
      var r = 0
      while (r < d) {
        st.counts(r * w + CountMinSketch.slot(bytes, r, w)) += 1L
        r += 1
      }
      // clone: the incoming UTF8String may point into a reused row
      // buffer; the map key must own its bytes
      st.cands.put(key.clone(), estimate(st.counts, bytes))
      // amortized trim: shrink back to cap only at 2x overflow; the
      // cut re-estimates first so stale values can't evict a heavy key
      if (st.cands.size > 2 * cap) { reestimate(st); trim(st, cap) }
    }
    st
  }

  override def merge(st: ApproxTopKState, other: ApproxTopKState): ApproxTopKState = {
    var i = 0
    while (i < st.counts.length) { st.counts(i) += other.counts(i); i += 1 }
    st.cands.putAll(other.cands)
    // re-estimate the union against the MERGED counters
    reestimate(st)
    trim(st, cap)
    st
  }

  override def eval(st: ApproxTopKState): Any = {
    // fresh estimates BEFORE the sort/cut — see [[reestimate]]
    reestimate(st)
    val entries = sorted(st)
    val n = math.min(k, entries.size)
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = entries.get(i)
      rows(i) = InternalRow(e.getKey, e.getValue)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(st: ApproxTopKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    st.counts.foreach(out.writeLong)
    out.writeInt(st.cands.size)
    val it = st.cands.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ApproxTopKState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val counts = Array.fill(d * w)(in.readLong())
    val n = in.readInt()
    val cands = new java.util.HashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      cands.put(UTF8String.fromBytes(kb), in.readLong())
      i += 1
    }
    new ApproxTopKState(counts, cands)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "approx_top_k"

  override def withNewMutableAggBufferOffset(o: Int): ApproxTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxTopKAgg =
    copy(child = newChildren.head)
}

/** Merge of ALREADY-BUILT Count-Min sketch arrays (the cube fold /
  * roll-up path): counters add elementwise, which is the LOSSLESS merge
  * — unlike HLL/KLL unions, sum-of-part-sketches is bit-identical to
  * the sketch of the whole, so cube cells can be folded and re-rolled
  * without compounding error. Null inputs (a group with no partial yet)
  * are skipped. */
case class CmsMergeAgg(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == buf.length,
        s"CMS geometry mismatch: got ${arr.numElements()}, want d*w=${buf.length}")
      var i = 0
      while (i < buf.length) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(bytes.length / 8)(in.readLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_merge_agg"

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
}

object CountMinSketch {
  type Q = (SparkSession, String) => DataFrame

  /** Depth (independent hash rows) × width (counters per row). */
  val D = 4
  val W = 2048

  private final val Seed = 42L // Spark's xxhash64 default seed

  /** Counter slot of `key` in row `r`: must stay bit-identical to the
    * column form `pmod(xxhash64(concat(lit(r.toString), key)), w)`. */
  private[functions] def slot(key: Array[Byte], r: Int, w: Int): Int = {
    val prefix = r.toString.getBytes("UTF-8")
    val bytes = new Array[Byte](prefix.length + key.length)
    System.arraycopy(prefix, 0, bytes, 0, prefix.length)
    System.arraycopy(key, 0, bytes, prefix.length, key.length)
    val h = XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed)
    (((h % w) + w) % w).toInt
  }

  def sketch(key: Column, d: Int = D, w: Int = W): Column =
    Bridge.toColumn(
      CountMinSketchAgg(Bridge.toExpression(key), d, w).toAggregateExpression())

  /** Per-group heavy hitters with CMS estimates in one bounded
    * aggregate — array of (key, est) structs, highest estimate first. */
  def approxTopK(key: Column, k: Int, d: Int = D, w: Int = W): Column =
    Bridge.toColumn(
      ApproxTopKAgg(Bridge.toExpression(key), d, w, k).toAggregateExpression())

  /** Lossless union of sketch-array partials (see [[CmsMergeAgg]]). */
  def mergeSketches(sk: Column, d: Int = D, w: Int = W): Column =
    Bridge.toColumn(
      CmsMergeAgg(Bridge.toExpression(sk), d, w).toAggregateExpression())

  /** Top-k (key, n_est) structs from a merged sketch + a candidate-key
    * array — pure built-in expressions over the stored columns: each
    * candidate re-estimated against the merged counters ([[estimate]]),
    * sorted by estimate desc then key asc (deterministic under ties),
    * top k kept. The candidate union across cells is the standard
    * mergeable-heavy-hitter heuristic (a globally heavy key is heavy in
    * at least one cell for uniform-ish cells; the margin is exactly
    * q131's documented candidate-set caveat), while the ESTIMATES are
    * exact CMS reads of the lossless counter sum. */
  def topkFromMerged(sk: Column, cands: Column, k: Int,
      d: Int = D, w: Int = W): Column =
    slice(
      array_sort(
        transform(cands, c =>
          struct(c.as("key"), asLong(estimate(sk, c, d, w)).as("n_est"))),
        (l, r) => {
          val (le, re) = (l.getField("n_est"), r.getField("n_est"))
          val (lk, rk) = (l.getField("key"), r.getField("key"))
          when(le > re, -1).when(le < re, 1)
            .when(lk < rk, -1).when(lk > rk, 1).otherwise(0)
        }),
      1, k)

  /** Point estimate from a sketch array column: min over the d rows of
    * the key's counter — pure built-in expressions (codegen'd), using
    * the same per-row hash family as the aggregate. */
  def estimate(sketchCol: Column, key: Column, d: Int = D, w: Int = W): Column = {
    val perRow = (0 until d).map { r =>
      element_at(sketchCol,
        (pmod(xxhash64(concat(lit(r.toString), key)), lit(w.toLong))
          + lit(r.toLong * w) + lit(1)).cast("int"))
    }
    least(perRow: _*)
  }

  // ---------------------------------------------------------------- q117
  /** Heavy hitters by sketch: the exact top-20 words (the ground truth
    * a test can hold the sketch against) alongside their Count-Min
    * estimates from ONE 4×2048-counter summary of the whole corpus.
    *
    * Scale shape: the sketch aggregate's state is 64 KiB per partial
    * regardless of corpus size — the |distinct words| hash aggregate
    * it replaces at 100 TB is the thing that doesn't fit; estimation is
    * a broadcast of the one-row sketch + map-side arithmetic.
    * Rows-only: estimates depend on the xxhash64 family (no DuckDB
    * twin); est ≥ truth and the (e/w)·N error bound are test-pinned. */
  def q117HeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val words = Tables.documents(spark, sfDir)
      .select(explode_outer(split(col("text"), " ")).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
    val sk = words.agg(sketch(col("w")).as("sk"))
    val top = words.groupBy(col("w")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("w")).limit(20)
    top.join(broadcast(sk))
      .select(col("w"), col("n_exact"),
        asLong(estimate(col("sk"), col("w"))).as("n_est"))
      .orderBy(col("n_exact").desc, col("w"))
  }

  // ---------------------------------------------------------------- q131
  /** GROUPED heavy hitters: top-10 words PER LANGUAGE from one
    * [[ApproxTopKAgg]] pass — where q117 sketches the whole corpus and
    * reads 20 known keys back, this answers "what are each group's
    * heavy keys" without knowing them in advance, with per-group state
    * bounded at d·w counters + 4k candidates.
    *
    * Scale shape: one corpus pass, map-side partial aggregation (the
    * buffer merges), shuffle volume = |groups| × sketch size — the
    * exact alternative (count per (lang, word), window top-k) shuffles
    * |distinct (lang, word)| rows. Rows-only: estimates ride the
    * xxhash64 family and the candidate set is sketch-heuristic at the
    * margin (no DuckDB twin); est ≥ truth, the (e/w)·N bound, and
    * recall of the true top-3 are test-pinned. */
  def q131GroupedHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val words = Tables.documents(spark, sfDir)
      .select(col("lang"), explode_outer(split(col("text"), " ")).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
    words.groupBy(col("lang"))
      .agg(approxTopK(col("w"), 10).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).as("rk"),
        col("col.key").as("word"), col("col.est").as("n_est"))
      .orderBy(col("lang"), col("rk"))
  }

  // ---------------------------------------------------------------- q166
  /** EXACT heavy hitters — the oracled anchor for the CMS family, the
    * way q36/q39 anchor the MinHash/embedding dedup paths: the same
    * tokenization and the same top-20 selection as q117, but counts only
    * (no sketch columns), so DuckDB can replay it verbatim. q117's
    * `n_exact` column is this query; CountMinSpec pins est ≥ exact and
    * the (e/w)·N bound against it, so the sketch's rows-only status is
    * anchored to a hash-matched twin rather than free-floating.
    *
    * Scale shape: one shuffle on the word key (map-side partial counts),
    * then a 20-row `orderBy.limit` = distributed TakeOrdered — never a
    * global sort of |distinct words|. */
  def q166HeavyHittersExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode_outer(split(col("text"), " ")).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("w")).limit(20)

  // ---------------------------------------------------------------- q167
  /** EXACT grouped heavy hitters — q131's oracled anchor: exact top-10
    * words per language via count + per-group rank, expressible in both
    * engines. Ties broken by word ascending, so the row set is
    * deterministic wherever counts collide.
    *
    * Scale shape: one shuffle to (lang, word) counts, then a window
    * partitioned by lang — rank state is per-group and the exchange is
    * on lang only. (This is the exact plan q131's one-pass sketch
    * replaces at 100 TB, where |distinct (lang, word)| rows is the
    * shuffle that hurts; at oracle scale it's the ground truth.) */
  def q167GroupedHeavyExact(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, sfDir)
      .select(col("lang"), explode_outer(split(col("text"), " ")).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("n_exact"))
    counts
      .withColumn("rk", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("n_exact").desc, col("w"))))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk"), col("w"), col("n_exact"))
      .orderBy(col("lang"), col("rk"))
  }

  lazy val defs: Map[String, Q] = Map(
    "q117_heavy_hitters" -> q117HeavyHitters,
    "q131_grouped_heavy_hitters" -> q131GroupedHeavyHitters,
    "q166_heavy_hitters_exact" -> q166HeavyHittersExact,
    "q167_grouped_heavy_exact" -> q167GroupedHeavyExact,
  )

  /** q117/q131 ride the xxhash64 family ⇒ rows-only; their exact twins
    * q166/q167 are fully oracled and anchor the estimates via
    * CountMinSpec's est-vs-exact pins. */
  lazy val sql: Map[String, String] = Map(
    "q166_heavy_hitters_exact" -> """
      SELECT w, count(*) AS n_exact FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) WHERE w IS NOT NULL AND w <> ''
      GROUP BY w ORDER BY n_exact DESC, w LIMIT 20""",
    "q167_grouped_heavy_exact" -> """
      SELECT lang, rk, w, n_exact FROM (
        SELECT lang, w, n_exact,
               row_number() OVER (PARTITION BY lang
                 ORDER BY n_exact DESC, w) AS rk
        FROM (
          SELECT lang, w, count(*) AS n_exact FROM (
            SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents
          ) WHERE w IS NOT NULL AND w <> ''
          GROUP BY lang, w
        )
      ) WHERE rk <= 10 ORDER BY lang, rk""",
  )
}
