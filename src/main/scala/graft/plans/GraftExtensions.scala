package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CharBagOverlap, HyperplaneSig, JaccardSim, JaroWinkler, MinHashSig, SimHash64, VecDot}

/** Session extensions — the sanctioned plug-in point for custom
  * expressions (enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`).
  *
  * Registers the native sketch expressions for SQL callers
  * (`simhash64(arr)`, `minhash_sig(arr, k)`,
  * `hyperplane_sig(vec, nPlanes, seed)` — the non-array arguments must
  * be literals, as they shape the kernel); DataFrame callers can use
  * the companion-object entry points directly without any session
  * configuration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(ApproxDistinctRewrite)
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs.head, litInt(exprs(1), "minhash_sig k"))))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
      (exprs: Seq[Expression]) => JaccardSim(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("char_bag_overlap"),
      new ExpressionInfo(classOf[CharBagOverlap].getName, "char_bag_overlap"),
      (exprs: Seq[Expression]) => CharBagOverlap(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (exprs: Seq[Expression]) =>
        HyperplaneSig(exprs.head, litInt(exprs(1), "hyperplane_sig nPlanes"),
          litLong(exprs(2), "hyperplane_sig seed"))))
  }
}
