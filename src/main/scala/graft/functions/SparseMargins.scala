package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-document linear margins over PACKED sparse features — the hot
  * inner kernel of the hashed-ngram trainers ([[graft.ext.QualityModel
  * .trainLogisticSparse]] / `trainSoftmaxSparse`): given one doc's
  * idx-sorted `array<struct<idx:int, v:double>>` and the K dense
  * weight rows (a plan reference object, like [[AhoCorasickScan]]'s
  * automaton — kilobytes to megabytes of doubles that a Literal would
  * re-serialize into every expression tree), returns the K margins
  * z_k = Σ_t w_k(idx_t)·v_t as `array<double>`.
  *
  * The higher-order-function spelling (one `aggregate` fold per class,
  * `element_at` on a literal array per term) is interpreted per
  * ELEMENT — K lambda dispatches per term; this is one compiled loop
  * per row touching each term once for all K classes. Accumulation
  * order is the array's (= idx) order per class, identical to the
  * per-class fold it replaces, so trained weights do not drift.
  * Precondition: every idx ∈ [0, w_k.length) — the trainers build
  * both sides from the same `dim`, and an out-of-range idx fails
  * loudly on the array access. */
case class SparseMargins(child: Expression, w: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sparse_margins"

  override protected def nullSafeEval(v: Any): Any =
    SparseMargins.compute(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sparseMarginsW", w, "double[][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.SparseMargins.compute($v, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SparseMargins = copy(child = newChild)
}

object SparseMargins {
  def compute(fx: ArrayData, w: Array[Array[Double]]): ArrayData = {
    val k = w.length
    val z = new Array[Double](k)
    val n = fx.numElements()
    var i = 0
    while (i < n) {
      val t = fx.getStruct(i, 2)
      val idx = t.getInt(0)
      val v = t.getDouble(1)
      var c = 0
      while (c < k) {
        z(c) += w(c)(idx) * v
        c += 1
      }
      i += 1
    }
    new GenericArrayData(z)
  }

  /** Margins column; `w` is cloned so later in-place updates on the
    * caller's arrays can never reach an already-built (lazy) plan. */
  def sparseMargins(fx: Column, w: Array[Array[Double]]): Column =
    ColumnBridge.column(
      SparseMargins(ColumnBridge.expression(fx), w.map(_.clone())))
}
