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

  lazy val defs: Map[String, Q] = Map(
    "q117_heavy_hitters" -> q117HeavyHitters,
  )

  /** xxhash64 family ⇒ rows-only (no oracle). */
  lazy val sql: Map[String, String] = Map.empty
}
