package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k (KMV / theta-family) distinct-value sketch — the set-
  * ALGEBRA sketch (Beyer et al., SIGMOD'07; Apache DataSketches'
  * theta family). Where HLL only supports union, a KMV sketch of the k
  * smallest hash values supports INTERSECTION and DIFFERENCE distinct
  * estimates too, because the k smallest of A∪B form a uniform sample
  * of the union on which per-set membership is decidable from the two
  * input sketches alone: for any h ≤ θ(A∪B), h ∈ sketch(A) ⇔
  * h ∈ hashes(A) (the union's threshold is ≤ each input's threshold).
  *
  * Determinism: hashes come from the splitmix64 finalizer of the key
  * (the repo's no-RNG convention) — same corpus, same sketch, same
  * estimate, every run and both gate scale factors. Hashes are stored
  * FLIPPED (`h ^ Long.MinValue`) so plain signed order equals the
  * unsigned order the estimator needs.
  *
  * Exactness floor: a sketch holding fewer than k values has seen the
  * WHOLE distinct set — estimates degrade to exact counts, so small
  * groups cost nothing in accuracy.
  */
object Kmv {

  /** Flipped splitmix64 of the key (signed order = unsigned order). */
  def hash(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) ^ Long.MinValue
  }

  /** Position of a flipped hash in [0,1) — top 53 bits, exact in a
    * double. */
  private def fracOf(flipped: Long): Double =
    ((flipped ^ Long.MinValue) >>> 11).toDouble / (1L << 53).toDouble

  /** Distinct-count estimate: exact below k, else (k−1)/U_(k). */
  def estimate(sk: Array[Long], k: Int): Double =
    if (sk.length < k) sk.length.toDouble
    else (k - 1).toDouble / fracOf(sk(k - 1))

  /** Union sketch: k smallest distinct of two sorted sketches (KMV is
    * closed under union — the lossless merge). */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val x = a(i); i += 1
          if (j < b.length && b(j) == x) j += 1 // dedup cross entries
          x
        } else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** (est |A∪B|, est |A∩B|, est |A∖B|) from the two sketches: union
    * sample members classified by binary search in each input. */
  def setOps(a: Array[Long], b: Array[Long],
      k: Int): (Double, Double, Double) = {
    val l = union(a, b, k)
    if (l.isEmpty) return (0.0, 0.0, 0.0)
    val eu = estimate(l, k)
    var ni = 0; var nd = 0
    var p = 0
    while (p < l.length) {
      val h = l(p)
      val ina = java.util.Arrays.binarySearch(a, h) >= 0
      val inb = java.util.Arrays.binarySearch(b, h) >= 0
      if (ina && inb) ni += 1 else if (ina) nd += 1
      p += 1
    }
    (eu, ni.toDouble / l.length * eu, nd.toDouble / l.length * eu)
  }
}

/** Mutable partial-aggregation buffer: a compacted sorted-distinct
  * prefix (≤ k) plus an unsorted scratch tail. Once the prefix is full,
  * rows hashing above the current k-th value are dropped on arrival —
  * after warm-up almost every row short-circuits, so the per-row cost
  * is one hash + one compare, and compaction (sort + dedup + truncate)
  * amortizes over the scratch width. */
final class KmvBuffer(val k: Int) extends Serializable {
  var arr: Array[Long] = Array.emptyLongArray // sorted distinct ≤ k
  var scratch: Array[Long] = new Array[Long](1024)
  var n: Int = 0

  // NB: no Long.MaxValue sentinel — a hash can legitimately BE
  // MaxValue, so "full" is tested on arr.length, not a magic ceiling.
  private def aboveCeiling(h: Long): Boolean =
    arr.length == k && h >= arr(k - 1)

  def add(h: Long): Unit = {
    if (aboveCeiling(h)) return
    if (n == scratch.length) compact()
    if (aboveCeiling(h)) return
    scratch(n) = h
    n += 1
  }

  def compact(): Unit = {
    if (n == 0) return
    val all = new Array[Long](arr.length + n)
    System.arraycopy(arr, 0, all, 0, arr.length)
    System.arraycopy(scratch, 0, all, arr.length, n)
    java.util.Arrays.sort(all)
    var w = 0
    var i = 0
    while (i < all.length && w < k) {
      if (w == 0 || all(w - 1) != all(i)) { all(w) = all(i); w += 1 }
      i += 1
    }
    arr = java.util.Arrays.copyOf(all, w)
    n = 0
  }
}

/** Typed Aggregator producing the sorted bottom-k sketch of a LONG key
  * column — partial buffers merge losslessly, so the shuffle carries
  * ≤ k longs per group regardless of input size (the mergeable-sketch
  * table shape of a11, with set algebra unlocked downstream). */
case class KmvAgg(k: Int)
    extends Aggregator[Long, KmvBuffer, Array[Long]] {
  override def zero: KmvBuffer = new KmvBuffer(k)
  override def reduce(b: KmvBuffer, v: Long): KmvBuffer = {
    b.add(Kmv.hash(v)); b
  }
  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    b.compact()
    var i = 0
    while (i < b.arr.length) { a.add(b.arr(i)); i += 1 }
    a
  }
  override def finish(b: KmvBuffer): Array[Long] = { b.compact(); b.arr }
  override def bufferEncoder: Encoder[KmvBuffer] =
    Encoders.javaSerialization[KmvBuffer]
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
