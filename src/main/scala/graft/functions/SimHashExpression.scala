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
