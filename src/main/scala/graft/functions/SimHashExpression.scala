package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array, as one codegen'd expression.
  *
  * Replaces the round-1 formulation (explode words → groupBy(doc_id) with
  * 64 `sum(when((h >> i) & 1 = 1, 1, -1))` columns → repack bits), which
  * shuffled every word of the corpus and carried a 64-column aggregate
  * through two exchange stages. The signature is a pure per-document
  * function of the token multiset, so it belongs in a map-only
  * projection: O(tokens × 64) register work inside whole-stage codegen,
  * zero shuffle. At 100 TB that's the difference between moving the
  * corpus once (to bucket signatures) and moving it twice.
  *
  * Semantics are bit-identical to the round-1 version: each token is
  * hashed with Spark's `xxhash64` (seed 42), occurrences count
  * multiplicity, bit i of the result is 1 iff the (+1/−1) vote sum over
  * tokens is strictly positive (ties → 0).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hashTokens(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val helper = ctx.addReferenceObj("simhashHelper", SimHash64,
        SimHash64.getClass.getName)
      s"${ev.value} = $helper.hashTokens($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 32-long MinHash signature of a token array in ONE codegen'd pass.
  *
  * Semantically identical to the composable form (word-3-gram shingles →
  * `xxhash64(s)` / `xxhash64(7, s)` → 32 XOR-rotations → per-rotation
  * min; `DedupCapSpec` asserts equality with the exploded groupBy
  * form), but where that form either shuffles every shingle (groupBy)
  * or runs 32 interpreted `array_min(zip_with(…))` lambdas per row,
  * this is a tight primitive loop: per shingle, two xxhash64 values and
  * 32 rotate-XOR-min register ops. Shingle strings are never
  * materialized (bytes are hashed via UTF8String.concat) and need no
  * de-duplication — duplicate shingles cannot change a min.
  *
  * Returns NULL when the doc has fewer than 3 tokens (no shingles),
  * matching the grouped form where such docs produce no signature row. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("minhashHelper", MinHashSig,
      MinHashSig.getClass.getName)
    nullSafeCodeGen(ctx, ev, x => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $helper.signature($x);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  final val H = 32
  private final val Seed = 42L
  /** Seed chain of Spark's `xxhash64(lit(7), s)`: the int literal 7 is
    * hashed first, yielding a constant second seed. */
  private final val Seed2 = XXH64.hashInt(7, 42L)

  def signature(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return null
    val mins = new Array[Long](H)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < n - 2) {
      val s = UTF8String.concat(
        toks.getUTF8String(i), space,
        toks.getUTF8String(i + 1), space,
        toks.getUTF8String(i + 2))
      val h1 = XXH64.hashUTF8String(s, Seed)
      val h2 = XXH64.hashUTF8String(s, Seed2)
      var b = 0
      while (b < H) {
        val cand = h1 ^ ((h2 << b) | (h2 >>> (64 - b)))
        if (cand < mins(b)) mins(b) = cand
        b += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  def minhashSig(tokens: Column): Column =
    Bridge.toColumn(MinHashSig(Bridge.toExpression(tokens)))
}

object SimHash64 {
  private final val Seed = 42L // Spark's xxhash64 default seed

  /** Vote-accumulate loop shared by eval and generated code. */
  def hashTokens(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(
          arr.get(i, org.apache.spark.sql.types.StringType)
            .asInstanceOf[UTF8String], Seed)
        var b = 0
        while (b < 64) {
          votes(b) += (((h >>> b) & 1L).toInt << 1) - 1 // bit→ +1/−1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  def simhash64(tokens: Column): Column =
    Bridge.toColumn(SimHash64(Bridge.toExpression(tokens)))
}
