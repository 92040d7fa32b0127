package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native sketch expressions for the LSH operators.
  *
  * Spark's higher-order functions (transform/aggregate) are interpreted
  * per element — a k=64 MinHash written as 64 `array_min(transform(...))`
  * branches costs 64 interpreted passes AND a 64-branch expression tree
  * that Catalyst re-analyzes at every self-join. These expressions do
  * one codegen'd pass per row (Carter-Wegman: two base hashes combine
  * into k slot hashes), which is the 100 TB path for fingerprinting.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private final val Seed1 = 0x9747b28cL
  private final val Seed2 = 0x85ebca6bL

  /** One pass over the shingle set updating all k minima. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XxHash64Function.hash(s, StringType, Seed1)
        val h2 = XxHash64Function.hash(s, StringType, Seed2)
        var j = 0
        while (j < k) {
          val h = h1 + (j + 1) * h2 // Carter-Wegman combination
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhashSig(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))
}

/** Random-hyperplane signature for cosine LSH: `nPlanes` sign bits
  * packed into a long. Plane coefficients are ±1 derived from a
  * splitmix64 of (seed, plane, dim) — data-independent, identical on
  * every executor, and never materialized as literals (a 20-table ×
  * 6-plane × 64-dim literal matrix bloats the plan the same way the
  * HOF minhash did). */
case class HyperplaneSig(child: Expression, nPlanes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], nPlanes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneSig.compute($c, $nPlanes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  private def mix(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Plane coefficients depend only on (seed, nPlanes, dim) — computed
    * once per executor and reused across every row (re-deriving the
    * splitmix64 mixes per element would cost nPlanes×dim hash mixes per
    * row on the hot fingerprinting path). */
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def coefs(seed: Long, nPlanes: Int, dim: Int): Array[Double] =
    coefCache.computeIfAbsent((seed, nPlanes, dim), { _ =>
      val c = new Array[Double](nPlanes * dim)
      var j = 0
      while (j < nPlanes) {
        var d = 0
        while (d < dim) {
          c(j * dim + d) =
            if ((mix(seed * 1000003L + j * 8191L + d) & 1L) == 1L) 1.0 else -1.0
          d += 1
        }
        j += 1
      }
      c
    })

  /** Signature over an array<double> vector. */
  def compute(arr: ArrayData, nPlanes: Int, seed: Long): Long = {
    val dim = arr.numElements()
    val c = coefs(seed, nPlanes, dim)
    var bits = 0L
    var j = 0
    while (j < nPlanes) {
      var dot = 0.0
      var d = 0
      val off = j * dim
      while (d < dim) {
        dot += arr.getDouble(d) * c(off + d)
        d += 1
      }
      if (dot > 0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  def hyperplaneSig(vec: Column, nPlanes: Int, seed: Long): Column =
    ColumnBridge.column(
      HyperplaneSig(ColumnBridge.expression(vec), nPlanes, seed))
}
