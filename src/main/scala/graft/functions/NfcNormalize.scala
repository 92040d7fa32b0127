package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — Spark has no built-in, yet it is
  * the first step of every web-corpus cleaning pipeline (decomposed
  * accents like `e` + U+0301 must compose to `é` before hashing,
  * dedup, or tokenization, or byte-identical text hashes apart).
  *
  * Semantics pinned to canonical composition (Unicode NFC) so the
  * DuckDB oracle's `nfc_normalize` agrees: both sides implement the
  * Unicode normalization algorithm (ICU/JDK vs utf8proc), which is
  * stable across versions for assigned codepoints.
  *
  * One codegen'd static call per row; the already-normalized fast path
  * (`Normalizer.isNormalized`, the overwhelmingly common case for web
  * text) avoids any allocation beyond the String decode.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
