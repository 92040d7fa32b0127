package graft.functions

import graft.SparkSpec

/** Pins [[Kmv]]'s estimator contract: exactness below k, union
  * losslessness, set-op accuracy on planted overlaps, and the
  * Aggregator's partition-order independence (mergeable partials). */
class KmvSpec extends SparkSpec {

  private def sketchOf(vals: Seq[Long], k: Int): Array[Long] = {
    val b = new KmvBuffer(k)
    vals.foreach(v => b.add(Kmv.hash(v)))
    b.compact()
    b.arr
  }

  test("below k the sketch is the whole hash set and estimates are exact") {
    val vals = (1L to 300L).flatMap(v => Seq(v, v)) // dups must not count
    val sk = sketchOf(vals, k = 512)
    assert(sk.length == 300)
    assert(Kmv.estimate(sk, 512) == 300.0)
  }

  test("estimate within 4 sigma on 50k distinct keys at k=1024") {
    val n = 50000
    val sk = sketchOf((1L to n.toLong), k = 1024)
    assert(sk.length == 1024)
    val e = Kmv.estimate(sk, 1024)
    val sigma = n / math.sqrt(1024 - 2)
    assert(math.abs(e - n) <= 4 * sigma, s"est $e vs exact $n")
  }

  test("union sketch equals the sketch of the union (lossless merge)") {
    val a = sketchOf(1L to 5000L, 256)
    val b = sketchOf(3000L to 9000L, 256)
    val direct = sketchOf(1L to 9000L, 256)
    assert(Kmv.union(a, b, 256).toSeq == direct.toSeq)
  }

  test("set ops recover planted overlap within 6% of the union") {
    val k = 1024
    val aVals = 1L to 12000L
    val bVals = 8001L to 20000L // |inter| = 4000, |A\B| = 8000, |union| = 20000
    val (eu, ei, ed) = Kmv.setOps(sketchOf(aVals, k), sketchOf(bVals, k), k)
    assert(math.abs(eu - 20000) <= 0.06 * 20000, s"union $eu")
    assert(math.abs(ei - 4000) <= 0.06 * 20000, s"inter $ei")
    assert(math.abs(ed - 8000) <= 0.06 * 20000, s"diff $ed")
  }

  test("disjoint and identical sets sit at the estimator's edges") {
    val k = 512
    val a = sketchOf(1L to 4000L, k)
    val b = sketchOf(10001L to 14000L, k)
    val (_, ei, _) = Kmv.setOps(a, b, k)
    assert(ei <= 0.02 * 8000, s"disjoint intersection read $ei")
    val (eu2, ei2, ed2) = Kmv.setOps(a, a, k)
    assert(math.abs(eu2 - ei2) < 1e-9 && ed2 == 0.0,
      "identical sets: union == intersection, empty difference")
  }

  test("empty inputs yield empty sketches and zero estimates") {
    val empty = sketchOf(Nil, 64)
    assert(empty.isEmpty && Kmv.estimate(empty, 64) == 0.0)
    assert(Kmv.setOps(empty, empty, 64) == ((0.0, 0.0, 0.0)))
  }

  test("aggregator result is independent of partitioning and row order") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val agg = udaf(KmvAgg(128))
    val vals = (1L to 3000L) ++ (1L to 3000L)
    def run(parts: Int, shuffled: Boolean): Seq[Long] = {
      val data = if (shuffled) vals.reverse else vals
      data.toDF("v").repartition(parts)
        .agg(agg(col("v")).as("sk"))
        .as[Array[Long]].head().toSeq
    }
    val ref = sketchOf(1L to 3000L, 128).toSeq
    assert(run(1, shuffled = false) == ref)
    assert(run(7, shuffled = true) == ref)
  }

  test("scratch compaction keeps only the k smallest across spills") {
    val b = new KmvBuffer(8)
    // feed 5000 values so compact() fires repeatedly mid-stream
    (1L to 5000L).foreach(v => b.add(Kmv.hash(v)))
    b.compact()
    val expect = (1L to 5000L).map(Kmv.hash).sorted.take(8)
    assert(b.arr.toSeq == expect)
  }
}
