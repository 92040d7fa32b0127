package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer APPLICATION — encode text with a merge table learned
  * by `graft.ext.TextStats.bpeMerges` (Sennrich et al. 2016). The
  * merge list rides the plan as a reference object (same pattern as
  * [[Pq]]); encoding is map-only, one tight loop per row, no shuffle —
  * the tokenize-100-TB shape.
  *
  * SEMANTICS ARE PINNED TO THE TRAINER, merge by merge: each word
  * splits into single characters, then each learned merge (in rank
  * order) runs ONE leftmost-non-overlapping left-to-right pass over
  * the word's symbol sequence — exactly what one `replace` pass does
  * to the trainer's delimiter-owned string encoding per round. A
  * rank-k merge can never create a match for an earlier merge (its
  * output symbol did not exist when earlier pairs were learned), so
  * sequential application reproduces the trainer's fixed point.
  * Tokens of consecutive words concatenate in order; concatenating
  * ALL tokens reproduces the input minus spaces (BPE is lossless —
  * the spec asserts it). */
case class BpeEncode(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(v: Any): Any =
    BpeEncode.compute(v.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.BpeEncode.compute($v, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  def compute(text: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val out = ArrayBuffer.empty[Any]
    for (word <- text.toString.split(' ') if word.nonEmpty) {
      var syms: ArrayBuffer[String] = {
        val b = new ArrayBuffer[String](word.length)
        var i = 0
        while (i < word.length) { b += String.valueOf(word.charAt(i)); i += 1 }
        b
      }
      for (m <- merges if syms.length >= 2) {
        val (l, r) = (m(0), m(1))
        val next = new ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            next += l + r
            i += 2
          } else {
            next += syms(i)
            i += 1
          }
        }
        syms = next
      }
      syms.foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.toArray)
  }

  /** `merges` as ordered (left, right) pairs — rank = position. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text),
      merges.map(p => Array(p._1, p._2)).toArray))
}
