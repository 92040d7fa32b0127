package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece SEGMENTATION — greedy longest-match-first with `##`
  * continuation pieces (the BERT tokenizer's algorithm; the third
  * standard subword family next to [[BpeEncode]]'s BPE and
  * [[UnigramSeg]]'s unigram LM). The vocabulary rides the plan as a
  * reference object (one shared hash set, not a per-row rebuild);
  * segmentation is map-only, one linear scan per word — greedy never
  * backtracks, so unlike the unigram path there is no exponential
  * enumeration to guard against.
  *
  * SEMANTICS ARE PINNED FOR CROSS-ENGINE PARITY (the DuckDB oracle
  * re-derives the same walk with a recursive CTE): at each position
  * take the LONGEST vocabulary piece matching the remaining word —
  * the word-initial piece raw, every later piece under a `##` prefix.
  * If no piece matches at some position, the WHOLE word becomes one
  * `[UNK]` token with NO backtracking, even when a different (shorter)
  * earlier choice would have segmented it — that lossy greed is
  * WordPiece's defining behavior and a spec pins the disagreement case
  * against the unigram path. The longest match is unique by
  * construction: at a fixed (word, position, length) the candidate
  * string is determined, so no tie-break is needed. */
case class WordPieceSeg(child: Expression, pieces: Array[String])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_seg"

  // Shared per-plan lookup structures (the reference-object pattern):
  // the vocab as a hash set and the longest RAW match length to try
  // (piece length minus the 2-char "##" marker for continuations).
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(s.add)
    s
  }
  @transient private lazy val maxRawLen: Int =
    if (pieces.isEmpty) 0
    else pieces.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length).max

  override protected def nullSafeEval(v: Any): Any =
    WordPieceSeg.compute(v.asInstanceOf[UTF8String], vocabSet, maxRawLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val refV = ctx.addReferenceObj("wordpieceVocab", vocabSet,
      "java.util.HashSet")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.WordPieceSeg.compute($v, $refV, $maxRawLen)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceSeg =
    copy(child = newChild)
}

object WordPieceSeg {

  val Unk = "[UNK]"

  def compute(word: UTF8String, vocab: java.util.HashSet[String],
      maxRawLen: Int): ArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = new ArrayBuffer[String](4)
    var pos = 0
    var dead = false
    while (pos < s.length && !dead) {
      var l = math.min(maxRawLen, s.length - pos)
      var found: String = null
      var foundLen = 0
      while (l >= 1 && found == null) {
        val sub = s.substring(pos, pos + l)
        val cand = if (pos == 0) sub else "##" + sub
        if (vocab.contains(cand)) { found = cand; foundLen = l }
        l -= 1
      }
      if (found == null) dead = true
      else { out += found; pos += foundLen }
    }
    val toks = if (dead) Array[String](Unk) else out.toArray
    new GenericArrayData(toks.map(p => UTF8String.fromString(p): Any))
  }

  /** `pieces` include the `##`-prefixed continuation forms. */
  def wordpieceSeg(word: Column, pieces: Seq[String]): Column =
    ColumnBridge.column(WordPieceSeg(ColumnBridge.expression(word),
      pieces.toArray))

  /** Derive a WordPiece vocabulary from a trained flat piece table
    * (BPE or unigram-LM output): every piece usable word-initially and,
    * under the `##` marker, as a continuation. */
  def vocabFromPieces(pieces: Seq[String]): Seq[String] =
    (pieces ++ pieces.map("##" + _)).distinct
}
