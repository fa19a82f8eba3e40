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
