package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaccard similarity of two string SETS — the refinement kernel
  * of every candidate-verified dedup path (MinHash, n-gram, curation).
  * The built-in spelling `size(array_intersect(a,b)) /
  * size(array_union(a,b))` builds two hash sets AND materializes two
  * result arrays per candidate pair; this builds one set and counts in
  * one pass (|∪| = |a| + |b| − |∩|). Preconditions match the call
  * sites: inputs are `array_distinct` outputs (no duplicates, no null
  * elements). Empty∩empty yields NaN (0/0), exactly like the built-in
  * spelling — NaN fails any `>= threshold` filter on both engines. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaccardSim.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    // build the set from the smaller side, probe with the larger
    val (small, nSmall, large, nLarge) =
      if (na <= nb) (a, na, b, nb) else (b, nb, a, na)
    val set = new java.util.HashSet[UTF8String](nSmall * 2)
    var i = 0
    while (i < nSmall) { set.add(small.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nLarge) {
      if (set.contains(large.getUTF8String(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
