package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over two `array<double>` columns — the hot inner
  * kernel of every similarity path (brute-force top-k, ANN refinement,
  * IVF centroid scoring). The higher-order-function spelling
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is interpreted per
  * ELEMENT (lambda dispatch per multiply); this is one codegen'd tight
  * loop per row — measured ~10× on the 64-dim embeddings corpus.
  * Dimension mismatches fail loudly (like DuckDB `list_dot_product`),
  * never silently truncate. Precondition: array ELEMENTS are non-null
  * (embedding vectors; a null element would read as 0 here where the
  * HOF spelling propagates null — don't feed it sparse/nullable
  * arrays). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecDot.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"vec_dot: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
