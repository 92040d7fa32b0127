package graft.ext

import graft.SparkSpec

/** Pins [[HnswIndex]]'s contract: beam-search results match exact
  * brute force on a deterministic fixture at generous ef, the paper's
  * M_max degree invariants hold after adversarial insert orders, the
  * no-RNG level function and full build are bit-deterministic, and
  * ties (parallel vectors — cosine distance 0) break on id order. */
class HnswSpec extends SparkSpec {

  /** Deterministic fixture: c clusters of spread points around
    * orthogonal-ish centers (splitmix-free — plain integer formula). */
  private def fixture(n: Int, dim: Int = 16): Seq[(Long, Array[Double])] =
    (0 until n).map { i =>
      val c = i % 4
      val v = Array.tabulate(dim) { j =>
        (if (j % 4 == c) 4.0 else 0.0) +
          ((i * 31 + j * 7) % 11 - 5) * 0.08
      }
      (i.toLong, v)
    }

  /** The INDEX's arithmetic, replicated exactly (normalize-then-dot,
    * same loop order) — the reference must tie-break the same
    * near-equal distances the index sees, not a float-reassociated
    * variant of them. */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    def unit(x: Array[Double]): Array[Double] = {
      var s = 0.0
      var i = 0
      while (i < x.length) { s += x(i) * x(i); i += 1 }
      val n = math.sqrt(s)
      x.map(_ / n)
    }
    val (ua, ub) = (unit(a), unit(b))
    var d = 0.0
    var i = 0
    while (i < ua.length) { d += ua(i) * ub(i); i += 1 }
    d
  }

  test("beam search matches brute force top-1 at generous ef") {
    val pts = fixture(300)
    val idx = new HnswIndex(m = 8, efConstruction = 64)
    pts.foreach { case (id, v) => idx.insert(id, v) }
    var agree = 0
    for ((qid, qv) <- pts.take(60)) {
      val exact = pts.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, cos(qv, cv)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
      val got = idx.search(qv, ef = 64, k = 2)
        .filter(_._1 != qid).head._1
      if (got == exact) agree += 1
    }
    assert(agree >= 58, s"only $agree/60 top-1 agree with brute force")
  }

  test("M_max degree invariants survive an adversarial insert order") {
    // all-in-one-cluster inserts maximize pruning churn
    val pts = fixture(200).sortBy { case (id, _) => (id % 4, id) }
    val idx = new HnswIndex(m = 4, efConstruction = 16)
    pts.foreach { case (id, v) => idx.insert(id, v) }
    assert(idx.maxDegree0 <= 8, s"level-0 degree ${idx.maxDegree0} > 2M")
    assert(idx.maxDegreeUpper <= 4,
      s"upper degree ${idx.maxDegreeUpper} > M")
  }

  test("same insert order builds a bit-identical index") {
    val pts = fixture(150)
    def build() = {
      val i = new HnswIndex(m = 6, efConstruction = 32)
      pts.foreach { case (id, v) => i.insert(id, v) }
      i
    }
    val (a, b) = (build(), build())
    for ((qid, qv) <- pts.take(40))
      assert(a.search(qv, 32, 5) === b.search(qv, 32, 5),
        s"divergent results for query $qid")
  }

  test("levels are deterministic, exponentially rare, and id-derived") {
    val idx = new HnswIndex(m = 8, efConstruction = 8)
    val levels = (0L until 4000L).map(idx.levelOf)
    assert(levels.forall(_ >= 0))
    val l0 = levels.count(_ == 0)
    // P(level 0) = 1 - 1/M = 7/8; allow wide slack
    assert(l0 > 3000 && l0 < 3900, s"$l0 of 4000 at level 0")
    assert((0L until 100L).map(idx.levelOf) ===
      (0L until 100L).map(idx.levelOf))
  }

  test("parallel vectors (cosine ties) break deterministically on id") {
    // power-of-two magnitudes: 2v and 4v normalize to the BIT-SAME
    // unit vector (scaling by 2^k is exact through the sqrt), so the
    // distances tie exactly and internal-index order must decide (a
    // ×3 magnitude would differ in the last ulp — a real near-tie,
    // not an exact one)
    val base = Array.tabulate(8)(j => (j + 1).toDouble)
    val idx = new HnswIndex(m = 4, efConstruction = 16)
    idx.insert(10L, base.map(_ * 2.0))
    idx.insert(20L, base.map(_ * 4.0))
    idx.insert(30L, base.map(_ * -1.0))
    val got = idx.search(base, ef = 8, k = 3).map(_._1)
    assert(got === Seq(10L, 20L, 30L),
      s"tie order should be insertion/internal-idx order, got $got")
  }

  test("exact-duplicate cliques stay reachable (SELECT-HEURISTIC)") {
    // fixture() repeats vectors with period 44 (i and i+44 are
    // bit-identical), planting ~7-member distance-0 cliques; under
    // closest-M selection each clique fills its link budget with
    // itself and detaches (measured: 15/60 queries lost their
    // duplicate). The heuristic's diversification must keep every
    // duplicate findable at sim 1.
    val pts = fixture(300)
    val idx = new HnswIndex(m = 8, efConstruction = 64)
    pts.foreach { case (id, v) => idx.insert(id, v) }
    for ((qid, qv) <- pts.take(60)) {
      val top = idx.search(qv, ef = 64, k = 2)
        .filter(_._1 != qid).head
      assert(top._2 > 0.9999999,
        s"query $qid lost its exact duplicate: best sim ${top._2}")
    }
  }

  test("export → fromRows round-trips to a bit-identical graph") {
    val pts = fixture(200)
    val a = new HnswIndex(m = 6, efConstruction = 32)
    pts.foreach { case (id, v) => a.insert(id, v) }
    // shuffle the rows (disk order is arbitrary) — fromRows re-sorts
    val rows = a.exportRows.toSeq.sortBy(r => (r._1 * 31) % 97)
    val b = HnswIndex.fromRows(6, 32, rows)
    for ((qid, qv) <- pts.take(50))
      assert(a.search(qv, 32, 5) === b.search(qv, 32, 5),
        s"persisted graph diverges for query $qid")
    // and the reloaded graph keeps accepting inserts
    b.insert(10000L, pts.head._2.map(_ * 1.5))
    assert(b.search(pts.head._2, 32, 1).nonEmpty)
  }

  test("corrupt persisted rows fail loudly") {
    val pts = fixture(50)
    val a = new HnswIndex(m = 4, efConstruction = 16)
    pts.foreach { case (id, v) => a.insert(id, v) }
    val rows = a.exportRows.toSeq
    intercept[RuntimeException] { // dangling neighbor id
      HnswIndex.fromRows(4, 16, rows.map { case (id, l, v, nb) =>
        if (id == rows.head._1)
          (id, l, v, nb.map(_.map(x => x + 100000L)))
        else (id, l, v, nb)
      })
    }
    intercept[IllegalArgumentException] { // level/adjacency mismatch
      HnswIndex.fromRows(4, 16, rows.map { case (id, l, v, nb) =>
        (id, l + 1, v, nb)
      })
    }
  }

  test("single-node index answers; empty index fails loudly") {
    val idx = new HnswIndex(m = 4, efConstruction = 8)
    idx.insert(7L, Array(1.0, 0.0))
    assert(idx.search(Array(0.5, 0.5), ef = 4, k = 3).map(_._1) ===
      Seq(7L))
    intercept[IllegalArgumentException] {
      new HnswIndex(m = 4, efConstruction = 8).search(Array(1.0), 4, 1)
    }
  }
}
