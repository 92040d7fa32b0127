package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer SEGMENTATION — the best segmentation of one
  * word under a piece vocabulary with probabilities (the encoding side
  * of Kudo 2018's unigram subword model, SentencePiece's default).
  * The piece table rides the plan as a reference object (the
  * [[BpeEncode]] / [[Pq]] pattern); segmentation is map-only, one
  * tight loop per row, no shuffle.
  *
  * SEMANTICS ARE PINNED FOR CROSS-ENGINE PARITY (the DuckDB oracle
  * re-derives the same argmax with a recursive CTE): the best path
  * maximizes the PRODUCT of piece probabilities accumulated in prefix
  * order (score · p, left to right — IEEE double multiplication is
  * order-sensitive, so both engines multiply the same way), with ties
  * broken by fewer pieces, then by the lexicographically smallest
  * space-joined segmentation in UTF-8 BYTE order (what DuckDB's
  * ORDER BY compares — diverges from Java's UTF-16 code-unit order
  * for non-BMP text, so the comparison goes through UTF8String). The word's
  * candidates are enumerated exhaustively rather than via max-DP:
  * two prefixes with bitwise-EQUAL scores can diverge after the same
  * suffix is appended under rounding, so a DP that discards one of
  * them could disagree with the oracle's path enumeration on the
  * final tie-break. Words are short (the trainer operates on distinct
  * vocabulary words), so exhaustive enumeration is bounded. */
case class UnigramSeg(child: Expression, pieces: Array[String],
    probs: Array[Double]) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_seg"

  override protected def nullSafeEval(v: Any): Any =
    UnigramSeg.compute(v.asInstanceOf[UTF8String], pieces, probs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refP = ctx.addReferenceObj("unigramPieces", pieces,
      "java.lang.String[]")
    val refW = ctx.addReferenceObj("unigramProbs", probs, "double[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.UnigramSeg.compute($v, $refP, $refW)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSeg =
    copy(child = newChild)
}

object UnigramSeg {

  def compute(word: UTF8String, pieces: Array[String],
      probs: Array[Double]): ArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // Path enumeration is exponential in word length (2^(L-1) worst
    // case) — callers filter words to TextStats.UniMaxWord; fail
    // loudly rather than hang if an unfiltered long token reaches us.
    require(s.length <= 20,
      s"unigram_seg: word of length ${s.length} exceeds the " +
        "enumeration cap — filter long tokens to a byte-fallback " +
        "path before segmentation (TextStats.UniMaxWord)")
    var bestScore = 0.0
    var bestN = 0
    var bestKey: String = null
    var bestSeg: Array[String] = null
    val acc = new ArrayBuffer[String](s.length)
    def rec(pos: Int, score: Double): Unit = {
      if (pos == s.length) {
        val key = acc.mkString(" ")
        val better =
          if (bestSeg == null) true
          else if (score != bestScore) score > bestScore
          else if (acc.length != bestN) acc.length < bestN
          // UTF-8 BYTE order, not Java's UTF-16 code-unit order: the
          // DuckDB oracle's ORDER BY seg compares UTF-8 bytes, and the
          // two orders diverge for non-BMP pieces vs U+E000..U+FFFF.
          else UTF8String.fromString(key)
            .compareTo(UTF8String.fromString(bestKey)) < 0
        if (better) {
          bestScore = score; bestN = acc.length
          bestKey = key; bestSeg = acc.toArray
        }
      } else {
        var i = 0
        while (i < pieces.length) {
          val p = pieces(i)
          if (pos + p.length <= s.length && s.startsWith(p, pos)) {
            acc += p
            rec(pos + p.length, score * probs(i))
            acc.remove(acc.length - 1)
          }
          i += 1
        }
      }
    }
    rec(0, 1.0)
    require(bestSeg != null,
      s"unigram vocabulary cannot segment '$s' — single-character " +
        "pieces must cover the corpus alphabet")
    new GenericArrayData(
      bestSeg.map(p => UTF8String.fromString(p): Any))
  }

  /** `pieces` as (piece, probability) — probabilities are the exact
    * cnt/total IEEE divisions both engines compute. */
  def unigramSeg(word: Column, pieces: Seq[(String, Double)]): Column =
    ColumnBridge.column(UnigramSeg(ColumnBridge.expression(word),
      pieces.map(_._1).toArray, pieces.map(_._2).toArray))
}
