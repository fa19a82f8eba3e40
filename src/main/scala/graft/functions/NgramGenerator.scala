package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst table-generating function (the custom-Generator row
  * of the extension surface; SURVEY §2.3): word n-grams of a tokenized
  * document as `(pos, ngram)` rows, 1-based positions.
  *
  * Why a Generator and not `explode(transform(sequence(…)))`: the
  * built-in composition materializes the full n-gram ARRAY per row
  * before exploding — for a 10k-token document at n=3 that is a ~30k
  * element array held live in the row buffer. A Generator streams one
  * output row at a time through `GenerateExec` with zero intermediate
  * collection, which is the shape that survives 100 TB documents with
  * long texts. Joining via `UTF8String.concatWs` keeps byte-level
  * copies of the tokens (no JVM String round-trip).
  *
  * Rows whose array has fewer than n tokens produce no output (standard
  * non-outer Generate semantics: the row disappears, like explode of an
  * empty array). Null array ⇒ no rows; null tokens join as empty.
  */
case class WordNgrams(child: Expression, n: Int)
    extends Generator with CodegenFallback {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${other.sql}")
  }

  private val space = UTF8String.fromString(" ")
  private val empty = UTF8String.fromString("")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val out = arr.numElements() - n + 1
    if (out <= 0) return Nil
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < out
      override def next(): InternalRow = {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          val t = arr.getUTF8String(i + j)
          parts(j) = if (t == null) empty else t
          j += 1
        }
        val row = new GenericInternalRow(2)
        row.setInt(0, i + 1) // 1-based, matching SQL slice oracles
        row.update(1, UTF8String.concatWs(space, parts: _*))
        i += 1
        row
      }
    }
  }

  override def prettyName: String = "word_ngrams"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNgrams =
    copy(child = newChildren.head)
}

object WordNgrams {
  /** word_ngrams(words, n) as a generator Column — expands to
    * (pos, ngram) rows when placed in a select (the analyzer's
    * ExtractGenerator rewrites the Project into a Generate node). */
  def wordNgrams(words: Column, n: Int): Column =
    Bridge.toColumn(WordNgrams(Bridge.toExpression(words), n))
}
