package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word-3-gram shingles of a token array, as one
  * codegen'd expression.
  *
  * Value-identical to `xxhash64(explode(array_distinct(transform(...))))`
  * — the composable form q36/q72 started from — but where that form
  * materializes a string per shingle, an array of those strings, and
  * deduplicates by string comparison (all interpreted: higher-order
  * lambdas don't codegen), this is a tight loop: per shingle one
  * UTF8String concat + one xxhash64, dedup on the 64-bit hash in a
  * primitive-friendly HashSet. First-occurrence order, so the output is
  * deterministic. At 100 TB the skipped allocations are the GC story of
  * the whole shingling stage.
  *
  * Returns NULL for docs with fewer than 3 tokens (no shingles) —
  * explode_outer + isNotNull downstream drops them, matching the
  * empty-array semantics of the composable form.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("shingleHelper", ShingleHashes,
      ShingleHashes.getClass.getName)
    nullSafeCodeGen(ctx, ev, x => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $helper.hashes($x);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Hashed character 3-grams at stride 2, as one codegen'd expression.
  *
  * Value-identical to
  * `transform(sequence(1, greatest(length(text)-2, 1), 2),
  *            i -> xxhash64(substring(text, i, 3)))`
  * — the composable form q45 started from — but that form is O(n²) per
  * document: every `substring(text, i, 3)` call re-scans the UTF-8
  * bytes from the start to find CHAR position i (variable-width
  * encoding has no random access), so a d-char document costs
  * Σ i ≈ d²/2 byte steps. This walks the bytes ONCE to index char
  * starts, then hashes each gram's byte slice in place — O(n) per
  * document, no per-gram string allocation, inside whole-stage codegen.
  * Not deduplicated (profile training counts occurrences).
  *
  * Returns NULL for null input; an empty string yields the single hash
  * of "" (matching the sequence(1,1,2) lower clamp of the old form).
  */
case class CharGramHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "char_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    CharGramHashes.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("charGramHelper", CharGramHashes,
      CharGramHashes.getClass.getName)
    nullSafeCodeGen(ctx, ev, x => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $helper.hashes($x);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

object CharGramHashes {
  private final val Seed = 42L // Spark's xxhash64 default seed
  private final val Gram = 3
  private final val Stride = 2

  def hashes(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // one pass: byte offset of each char start (+ terminal offset)
    var nc = 0
    var i = 0
    while (i < nb) { i += UTF8String.numBytesForFirstByte(bytes(i)); nc += 1 }
    val off = new Array[Int](nc + 1)
    i = 0; var c = 0
    while (i < nb) {
      off(c) = i; i += UTF8String.numBytesForFirstByte(bytes(i)); c += 1
    }
    off(nc) = nb
    // gram starts are 1-based chars 1, 1+Stride, ..., max(nc-Gram+1, 1)
    val last = math.max(nc - Gram + 1, 1)
    val count = (last - 1) / Stride + 1
    val out = new Array[Long](count)
    var k = 0
    while (k < count) {
      val s0 = k * Stride
      val start = if (s0 < nc) off(s0) else nb
      val end = if (s0 + Gram < nc) off(s0 + Gram) else nb
      out(k) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
        end - start, Seed)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def charGramHashes(text: Column): Column =
    Bridge.toColumn(CharGramHashes(Bridge.toExpression(text)))
}

object ShingleHashes {
  private final val Seed = 42L // Spark's xxhash64 default seed

  def hashes(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return null
    val space = UTF8String.fromString(" ")
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      val s = UTF8String.concat(
        toks.getUTF8String(i), space,
        toks.getUTF8String(i + 1), space,
        toks.getUTF8String(i + 2))
      val h = XXH64.hashUTF8String(s, Seed)
      if (seen.add(h)) out += h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def shingleHashes(tokens: Column): Column =
    Bridge.toColumn(ShingleHashes(Bridge.toExpression(tokens)))
}
