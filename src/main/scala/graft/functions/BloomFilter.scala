package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

import graft.operators.Stable._

/** Bloom-filter JOIN PRE-FILTER: build a fixed-size bit-set summary of
  * the small side's join keys, broadcast it, and drop fact rows that
  * cannot match BEFORE the join's shuffle — the explicit form of
  * runtime row-level filtering, and the standard move at 100 TB when
  * the qualified key set is too big to broadcast as a hash table but
  * its Bloom filter (m bits, here 64 KiB) always fits.
  *
  * No false negatives (every true match passes), tunable false
  * positives (a stray fact row survives the pre-filter and dies in the
  * real join) — so the END RESULT IS EXACT and DuckDB-oracle-able,
  * while the shuffle moves ≈ |matching| + fp·|non-matching| rows
  * instead of |fact|.
  *
  * Hashing: Kirsch-Mitzenmacher double hashing — two xxhash64 draws
  * per key, probe bits at h1 + i·h2 (i < k), the [[Dedup]] MinHash
  * discipline. k = 6, m = 2¹⁹ bits ⇒ fp ≈ (1−e^(−kn/m))^k, ~1% at
  * n = 30k keys.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes {

  // >= 64: the bit-set is long words, and 0 / Int.MinValue / sub-word
  // sizes all pass a bare power-of-two check yet produce an empty (or
  // negative-size) buffer and a mid-job ArithmeticException
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(k > 0, s"k must be positive, got $k")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.set(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    // self-describing output: word 0 carries the format tag + k, words
    // 1.. the bit-set. The probe reads k from the header instead of
    // trusting a caller argument — a probe k larger than the build k
    // would test bits that were never set and silently break the
    // no-false-negative guarantee — and validates the tag, so a foreign
    // long array (or a value from the old headerless format, whose
    // first word is bit-set data) fails loudly instead of being probed
    // with wrong bit offsets
    val out = new Array[Long](buf.length + 1)
    out(0) = BloomFilter.HeaderMagic | k.toLong
    System.arraycopy(buf, 0, out, 1, buf.length)
    new GenericArrayData(out)
  }

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
  override def prettyName: String = "bloom_filter_agg"

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** Membership probe against a bloom column built by [[BloomFilterAgg]].
  * k is read from the bloom's own header word (set at build time), so
  * build and probe can never disagree on the hash count. Codegen'd (the
  * probe sits in the FACT-SCAN hot path): the generated code calls the
  * same static helper eval uses, so interpreted and compiled paths agree
  * bit for bit. */
case class MightContainLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // ImplicitCast: narrower integral keys widen identically on the build
  // (BloomFilterAgg) and probe side, so the hashes agree
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false), LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_long"

  override def nullSafeEval(arr: Any, key: Any): Any =
    BloomFilter.contains(arr.asInstanceOf[ArrayData], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("bloomHelper", BloomFilter,
      BloomFilter.getClass.getName)
    nullSafeCodeGen(ctx, ev, (arr, key) =>
      s"${ev.value} = $helper.contains($arr, $key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MightContainLong =
    copy(left = newLeft, right = newRight)
}

object BloomFilter extends Serializable {
  type Q = (SparkSession, String) => DataFrame

  /** 2¹⁹ bits = 64 KiB; k=6 ⇒ ~1% fp at 30k keys, ~0.1% at 10k. */
  val NumBits = 1 << 19
  val K = 6

  /** Format tag in the high bits of the header word ([[BloomFilterAgg
    * .eval]] writes `HeaderMagic | k`; low 16 bits reserved for k). A
    * bare bit-set word landing in [1,64] would otherwise be accepted as
    * a k header and probed with wrong offsets — the tag makes foreign
    * or old-format arrays fail loudly instead. */
  private[functions] val HeaderMagic: Long = 0x424C4FL << 40 // "BLO"

  private def h1(v: Long): Long = XXH64.hashLong(v, 42L)
  private def h2(v: Long): Long = XXH64.hashLong(v, 7L)

  private[functions] def set(bits: Array[Long], v: Long, k: Int): Unit = {
    val m = bits.length * 64
    val a = h1(v); val b = h2(v)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(a + i * b, m).toInt
      bits(idx >> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** Shared by interpreted eval and generated code (public for codegen).
    * Word 0 of `bits` is the k header written by [[BloomFilterAgg.eval]];
    * the bit-set follows. */
  def contains(bits: ArrayData, v: Long): Boolean = {
    val header = bits.getLong(0)
    val k = (header & 0xFFFFL).toInt
    val m = (bits.numElements() - 1) * 64
    if ((header & ~0xFFFFL) != HeaderMagic || k < 1 || k > 64 || m < 64)
      throw new IllegalArgumentException(
        s"not a bloom_filter_agg value: header=0x${header.toHexString}, " +
          s"$m bit(s)")
    val a = h1(v); val b = h2(v)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(a + i * b, m).toInt
      if ((bits.getLong((idx >> 6) + 1) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def agg(key: Column, numBits: Int = NumBits, k: Int = K): Column =
    Bridge.toColumn(
      BloomFilterAgg(Bridge.toExpression(key), numBits, k)
        .toAggregateExpression())

  def mightContain(bloom: Column, key: Column): Column =
    Bridge.toColumn(MightContainLong(Bridge.toExpression(bloom),
      Bridge.toExpression(key)))

  // ---------------------------------------------------------------- q133
  /** The pre-filter graded end-to-end: revenue of high-balance
    * customers' orders by priority. The qualified order-key set (one
    * semi-join) is summarized into ONE 64 KiB bloom row, broadcast, and
    * probed codegen-side before lineitem ever reaches the real join's
    * shuffle. False positives are eliminated by that join, so the
    * result — and the DuckDB oracle, which is the PLAIN join — is
    * exact; what the bloom buys is the shuffle reading ~|matching
    * lines| instead of |lineitem| (BloomFilterSpec pins the fp rate and
    * the no-false-negative guarantee; at local sf the real join is
    * broadcast anyway — the plan shape is what generalizes). */
  def q133BloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 8000.0)
    val o = Tables.orders(spark, sfDir)
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
    val bloom = o.agg(agg(col("o_orderkey")).as("bf"))
    val li = Tables.lineitem(spark, sfDir)
      .join(broadcast(bloom))
      .filter(mightContain(col("bf"), col("l_orderkey")))
      .drop("bf")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  lazy val defs: Map[String, Q] = Map(
    "q133_bloom_join" -> q133BloomJoin,
  )

  /** The oracle is the SAME query without the bloom — exactness of the
    * pre-filtered plan is precisely the property under test. */
  lazy val sql: Map[String, String] = Map(
    "q133_bloom_join" -> """
      SELECT o_orderpriority,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(1) AS n_lines
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
      WHERE EXISTS (
        SELECT 1 FROM customer
        WHERE c_custkey = o_custkey AND c_acctbal > 8000.0)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
  )
}
