package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native product-quantization kernels (see graft.ext.Similarity's PQ
  * section for the operator; Jégou et al., PAMI'11). These exist for
  * the same reason as [[VecDot]]: the Column-API spelling of "argmin
  * over m × ksub literal centroids" is an expression TREE with one
  * node per centroid — at m=8, ksub=32 the generated code for a single
  * project blows Janino's 64 KB method limit, dropping the whole stage
  * to interpreted eval. Here the codebook is a plan REFERENCE OBJECT
  * (`ctx.addReferenceObj`), the generated code is one static call per
  * row regardless of codebook size, and the loops JIT as tight nested
  * `while`es. Codebook arrays are never mutated after construction.
  *
  * Determinism: all loops accumulate sequentially in fixed order and
  * ties take the LOWEST code id (strict `<` improvement), so outputs
  * are independent of partitioning. */
object Pq {

  /** codes(s) = argmin_c ‖v[s·dSub..(s+1)·dSub) − books(s)(c)‖² —
    * the PQ encoder. Precondition: v.length = m·dSub, elements
    * non-null. */
  def computeCodes(v: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val dSub = books(0)(0).length
    require(v.numElements() == m * dSub,
      s"pq_codes: vector dim ${v.numElements()} != m*dSub = ${m * dSub}")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dist = 0.0
        var i = 0
        while (i < dSub) {
          val diff = v.getDouble(s * dSub + i) - cent(i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** lut(s)(c) = ⟨q[s·dSub..(s+1)·dSub), books(s)(c)⟩ — the per-query
    * ADC look-up table. */
  def computeLut(q: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val dSub = books(0)(0).length
    require(q.numElements() == m * dSub,
      s"pq_lut: vector dim ${q.numElements()} != m*dSub = ${m * dSub}")
    val rows = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val row = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < dSub) {
          acc += q.getDouble(s * dSub + i) * cent(i)
          i += 1
        }
        row(c) = acc
        c += 1
      }
      rows(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  /** ADC score = Σ_s lut(s)(codes(s)) — m array lookups, the whole
    * compressed-domain scan cost per (query, code-word) pair. */
  def computeAdc(lut: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    require(lut.numElements() == m,
      s"pq_adc: lut has ${lut.numElements()} sub-spaces, codes $m")
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    acc
  }

  def pqCodes(v: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(v), books))

  def pqLut(q: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(q), books))

  def pqAdc(lut: Column, codes: Column): Column =
    ColumnBridge.column(
      PqAdc(ColumnBridge.expression(lut), ColumnBridge.expression(codes)))
}

case class PqCodes(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(v: Any): Any =
    Pq.computeCodes(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.Pq.computeCodes($v, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

case class PqLut(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(q: Any): Any =
    Pq.computeLut(q.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, q => s"graft.functions.Pq.computeLut($q, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    Pq.computeAdc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, c) => s"graft.functions.Pq.computeAdc($l, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
