package graft.ext

/** HNSW (Hierarchical Navigable Small World, Malkov & Yashunin,
  * TPAMI 2020) — the production graph-ANN index, completing the ANN
  * surface next to the signature scan (e3_ann), IVF, PQ, and IVFADC:
  * greedy search over a layered proximity graph, O(log n) expected
  * hops via the level hierarchy, with recall controlled by the beam
  * width `ef` instead of a cell/probe budget.
  *
  * This is the PARTITION-LOCAL build: the distributed deployment is
  * sharded-HNSW (each executor owns one shard's graph, queries fan out
  * to all shards and merge top-k — the standard production layout,
  * since graph construction is inherently sequential per shard).
  * Index state is bounded by the partition, never the corpus.
  *
  * Determinism (the repo's no-RNG convention): the level assignment
  * replaces HNSW's RNG with the splitmix64 finalizer of the vector id
  * (u ∈ (0,1] from the top 53 bits, level = ⌊−ln(u)·m_L⌋ with
  * m_L = 1/ln(M) per the paper's default); insertion order is the
  * caller's (ascending id), and every heap/selection comparator
  * totals orders on (distance, internal index) — so the same shard
  * contents always build the same graph and return the same results.
  *
  * Neighbor selection is the paper's SELECT-HEURISTIC (Algorithm 4,
  * with keep-pruned-connections): a candidate joins the neighbor set
  * only if it is closer to the new node than to every already-selected
  * neighbor, then pruned candidates back-fill to M. The simple
  * closest-M selection measurably DETACHES duplicate cliques here — a
  * region of mutual near-zero distances fills every member's link
  * budget with itself and becomes unreachable (HnswSpec pins the
  * duplicate-heavy fixture that caught it) — while the heuristic's
  * diversification keeps an outside edge per region. Overflow prunes
  * through the same heuristic to M_max (2M at level 0, M above).
  * Distance is cosine distance over vectors normalized at insert
  * (1 − dot of unit vectors).
  */
final class HnswIndex(m: Int, efConstruction: Int) extends Serializable {
  require(m >= 2 && efConstruction >= m,
    "HNSW: need m >= 2 and efConstruction >= m")

  private val mmax0 = 2 * m
  private val mL = 1.0 / math.log(m.toDouble)

  private val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
  private val vecs =
    scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
  private val levels = scala.collection.mutable.ArrayBuffer.empty[Int]
  // links(node)(level) = neighbor internal indices, level ≤ levels(node)
  private val links = scala.collection.mutable.ArrayBuffer
    .empty[Array[scala.collection.mutable.ArrayBuffer[Int]]]
  private var entry = -1
  private var maxLevel = -1

  def size: Int = ids.length

  /** Deterministic exponential level from the id (splitmix64 → (0,1]). */
  def levelOf(id: Long): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    val u = ((z >>> 11) + 1).toDouble / (1L << 53).toDouble
    math.floor(-math.log(u) * mL).toInt
  }

  /** Normalize a copy; zero vectors map to themselves (distance 1). */
  private def unit(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v.clone()
    else {
      val out = new Array[Double](v.length)
      i = 0
      while (i < v.length) { out(i) = v(i) / n; i += 1 }
      out
    }
  }

  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { d += a(i) * b(i); i += 1 }
    1.0 - d
  }

  /** Greedy hill-descent at one level (the ef=1 zoom-in phase). */
  private def greedy(q: Array[Double], from: Int, level: Int): Int = {
    var cur = from
    var curD = dist(q, vecs(cur))
    var improved = true
    while (improved) {
      improved = false
      val nbrs = links(cur)(level)
      var i = 0
      while (i < nbrs.length) {
        val n = nbrs(i)
        val d = dist(q, vecs(n))
        if (d < curD || (d == curD && n < cur)) {
          cur = n; curD = d; improved = true
        }
        i += 1
      }
    }
    cur
  }

  /** Beam search at one level: ≤ ef closest (dist, idx) ascending. */
  private def searchLayer(q: Array[Double], ep: Int, ef: Int,
      level: Int): scala.collection.mutable.ArrayBuffer[(Double, Int)] = {
    val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
    val visited = new java.util.HashSet[Integer]()
    // candidates: closest-first; results: farthest-first (bounded ef)
    val cand = scala.collection.mutable.PriorityQueue
      .empty[(Double, Int)](ord.reverse)
    val res = scala.collection.mutable.PriorityQueue
      .empty[(Double, Int)](ord)
    val d0 = dist(q, vecs(ep))
    visited.add(ep)
    cand.enqueue((d0, ep))
    res.enqueue((d0, ep))
    while (cand.nonEmpty) {
      val (cd, c) = cand.dequeue()
      if (cd > res.head._1) cand.clear() // no candidate can improve
      else {
        val nbrs = links(c)(level)
        var i = 0
        while (i < nbrs.length) {
          val n = nbrs(i)
          if (!visited.contains(n)) {
            visited.add(n)
            val d = dist(q, vecs(n))
            if (res.length < ef || d < res.head._1 ||
                (d == res.head._1 && n < res.head._2)) {
              cand.enqueue((d, n))
              res.enqueue((d, n))
              if (res.length > ef) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
    out ++= res
    out.sortInPlace()(ord)
    out
  }

  /** SELECT-HEURISTIC with keep-pruned-connections: from distance-
    * sorted candidates, keep those closer to the target than to every
    * kept one (diversification), back-filling pruned candidates
    * closest-first up to `cap`. Deterministic: input order is a total
    * (dist, idx) order and the rule is order-driven. */
  private def selectHeuristic(
      sorted: scala.collection.mutable.ArrayBuffer[(Double, Int)],
      cap: Int): scala.collection.mutable.ArrayBuffer[Int] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    val pruned = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < sorted.length && kept.length < cap) {
      val (d, c) = sorted(i)
      var diverse = true
      var j = 0
      while (diverse && j < kept.length) {
        if (dist(vecs(c), vecs(kept(j))) < d) diverse = false
        j += 1
      }
      if (diverse) kept += c else pruned += c
      i += 1
    }
    var p = 0
    while (kept.length < cap && p < pruned.length) {
      kept += pruned(p)
      p += 1
    }
    kept
  }

  /** Insert one vector (caller supplies ascending ids for determinism). */
  def insert(id: Long, vec: Array[Double]): Unit = {
    val v = unit(vec)
    val lvl = levelOf(id)
    val node = ids.length
    ids += id
    vecs += v
    levels += lvl
    links += Array.fill(lvl + 1)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    if (entry < 0) { entry = node; maxLevel = lvl; return }
    var ep = entry
    var l = maxLevel
    while (l > lvl) { ep = greedy(v, ep, l); l -= 1 }
    l = math.min(maxLevel, lvl)
    while (l >= 0) {
      val cand = searchLayer(v, ep, efConstruction, l)
      val cap = if (l == 0) mmax0 else m
      val chosen = selectHeuristic(cand, m)
      chosen.foreach { n =>
        links(node)(l) += n
        links(n)(l) += node
        if (links(n)(l).length > cap) {
          // re-select n's neighborhood through the same heuristic
          val scored = links(n)(l).map(x => (dist(vecs(n), vecs(x)), x))
            .sortBy(identity)(
              Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
          val kept = selectHeuristic(scored, cap)
          links(n)(l).clear()
          links(n)(l) ++= kept
        }
      }
      if (cand.nonEmpty) ep = cand.head._2
      l -= 1
    }
    if (lvl > maxLevel) { entry = node; maxLevel = lvl }
  }

  /** Top-k (id, cosine) for a query vector, beam width ef ≥ k. */
  def search(q: Array[Double], ef: Int, k: Int): Seq[(Long, Double)] = {
    require(size > 0, "HNSW: search on empty index")
    val v = unit(q)
    var ep = entry
    var l = maxLevel
    while (l > 0) { ep = greedy(v, ep, l); l -= 1 }
    searchLayer(v, ep, math.max(ef, k), 0)
      .take(k)
      .map { case (d, n) => (ids(n), 1.0 - d) }
      .toSeq
  }

  /** Structural gates: max degree at level 0 / above level 0. */
  def maxDegree0: Int =
    if (links.isEmpty) 0 else links.map(_(0).length).max
  def maxDegreeUpper: Int = {
    var mx = 0
    links.foreach { ls =>
      var l = 1
      while (l < ls.length) { mx = math.max(mx, ls(l).length); l += 1 }
    }
    mx
  }

  /** Export one row per node: (id, level, NORMALIZED vector,
    * per-level neighbor IDS) — the persisted-index record. Neighbor
    * ids (not internal indices) make the rows order-independent on
    * disk; [[HnswIndex.fromRows]] rebuilds the identical graph. */
  def exportRows: Iterator[(Long, Int, Array[Double], Array[Array[Long]])] =
    (0 until size).iterator.map { n =>
      (ids(n), levels(n), vecs(n),
        links(n).map(_.map(ids(_)).toArray))
    }
}

object HnswIndex {

  /** Rebuild a graph from persisted rows — the EXACT graph
    * [[HnswIndex.exportRows]] wrote, bit-for-bit: nodes re-enter in
    * ascending id (the insertion-order contract), adjacency is copied
    * (not re-derived), and the entry point is the FIRST node (lowest
    * internal index) at the maximum level — which is exactly the node
    * that raised `maxLevel` last during the original build, since
    * levels only ratchet upward. */
  def fromRows(m: Int, efConstruction: Int,
      rows: Seq[(Long, Int, Array[Double], Array[Array[Long]])])
      : HnswIndex = {
    val idx = new HnswIndex(m, efConstruction)
    val sorted = rows.sortBy(_._1)
    val pos = sorted.iterator.map(_._1).zipWithIndex.toMap
    sorted.foreach { case (id, lvl, vec, nbrs) =>
      require(nbrs.length == lvl + 1,
        s"corrupt HNSW row $id: ${nbrs.length} levels vs ${lvl + 1}")
      idx.ids += id
      idx.vecs += vec // already normalized at export
      idx.levels += lvl
      idx.links += nbrs.map { ns =>
        val b = scala.collection.mutable.ArrayBuffer.empty[Int]
        ns.foreach { nid =>
          b += pos.getOrElse(nid,
            sys.error(s"corrupt HNSW row $id: dangling neighbor $nid"))
        }
        b
      }
    }
    if (idx.ids.nonEmpty) {
      idx.maxLevel = idx.levels.max
      idx.entry = idx.levels.indexOf(idx.maxLevel)
    }
    idx
  }
}
