package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.SimHash64

/** Session extensions — the sanctioned plug-in point for custom
  * expressions (enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`).
  *
  * Registers `simhash64` for SQL callers; DataFrame callers can use
  * [[graft.functions.SimHash64.simhash64]] directly without any session
  * configuration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
  }
}
