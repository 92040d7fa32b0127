package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact character-multiset (bag) intersection size of two strings,
  * counted over raw UTF-8 BYTES — the O(la+lb) candidate filter ahead
  * of O(la·lb) edit-similarity scorers ([[JaroWinkler]]).
  *
  * Why it is an exact filter for Jaro-Winkler ≥ θ (no recall loss):
  * Jaro's match set pairs equal bytes, each position used at most once,
  * so the match count m is a bipartite matching between equal bytes and
  * m ≤ I = Σ_byte min(count_a, count_b) — this expression. With the
  * Winkler bonus capped at 4·0.1·(1−J) and (m−t/2)/m ≤ 1:
  * JW ≥ θ ⇒ J ≥ (θ−0.4)/0.6 ⇒ I/la + I/lb ≥ 3·(θ−0.4)/0.6 − 1 = 5θ−3.
  * Callers should test the division-free form
  * I·(la+lb) ≥ (5θ−3)·la·lb with la/lb = octet_length (byte lengths,
  * matching the byte-level scorer).
  *
  * One pass over each string, a single int[256] histogram, codegen'd.
  */
case class CharBagOverlap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "char_bag_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CharBagOverlap.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CharBagOverlap.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharBagOverlap =
    copy(left = newLeft, right = newRight)
}

object CharBagOverlap {
  def compute(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.getBytes
    val b = ub.getBytes
    if (a.length == 0 || b.length == 0) return 0
    val cnt = new Array[Int](256)
    var i = 0
    while (i < a.length) { cnt(a(i) & 0xff) += 1; i += 1 }
    var inter = 0
    i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (cnt(c) > 0) { cnt(c) -= 1; inter += 1 }
      i += 1
    }
    inter
  }

  def charBagOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(
      CharBagOverlap(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** The byte MULTISET of a string expanded to distinct (byte, occurrence)
  * tokens — `"aba"` → `[(a,1), (b,1), (a,2)]` — encoded as longs
  * `byte << 32 | occurrence` so a row's tokens are pairwise distinct
  * for any string length (occurrence counts can't overflow into the
  * byte bits).
  *
  * Purpose: turns the bag-overlap bound gating [[JaroWinkler]] into a
  * SET overlap (`char_bag_overlap(a, b)` = |tokens(a) ∩ tokens(b)|),
  * which is the form prefix filtering (AllPairs/PPJoin) blocks
  * sub-quadratically. One codegen'd pass, one int[256] histogram.
  */
case class ByteBagTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_bag_tokens"

  override protected def nullSafeEval(input: Any): Any =
    ByteBagTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteBagTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteBagTokens =
    copy(child = newChild)
}

object ByteBagTokens {
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new Array[Long](bytes.length)
    val cnt = new Array[Int](256)
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xff
      cnt(c) += 1
      out(i) = (c.toLong << 32) | cnt(c).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  def byteBagTokens(s: Column): Column =
    ColumnBridge.column(ByteBagTokens(ColumnBridge.expression(s)))
}
