package graft.lake

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the z-order arithmetic — pure driver-side
  * functions, so these run without a Spark job. The invariants are the
  * ones correctness rests on: quantization is monotone (so clamped
  * out-of-domain values can never escape the bucket superset),
  * interleaving is a bijection on the grid, and every in-box point's
  * bucket is enumerated by [[Layout.bucketsForBox]]. */
class LayoutProperties extends AnyFunSuite {

  private val spec = Layout.EventsSpec

  test("property: quantization is monotone and clamped to the grid") {
    val vs = Gen.listOfN(500, Gen.chooseNum(-100000L, 100000L))
      .sample.getOrElse(Nil).sorted
    val qs = vs.map(Layout.quantizeL(_, 0L, 44640L))
    assert(qs == qs.sorted, "quantization must preserve order")
    assert(qs.forall(q => q >= 0 && q < 65536), "grid range")
  }

  test("property: bit interleave is a bijection on 16-bit pairs") {
    val pairs = Gen.listOfN(500,
      Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)))
      .sample.getOrElse(Nil)
    def deinterleave(z: Long, bits: Int): (Long, Long) = (
      (0 until bits).map(i => ((z >> (2 * i)) & 1L) << i).sum,
      (0 until bits).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum)
    pairs.foreach { case (x, y) =>
      assert(deinterleave(Layout.interleaveL(x, y, 16), 16) == (x, y))
    }
    assert(pairs.map { case (x, y) => Layout.interleaveL(x, y, 16) }
      .distinct.size == pairs.distinct.size, "no collisions")
  }

  test("property: every in-box point's bucket is enumerated") {
    val boxes = Gen.listOfN(50, for {
      x0 <- Gen.chooseNum(0L, 44000L); x1 <- Gen.chooseNum(x0, 44640L)
      y0 <- Gen.chooseNum(0L, 1400L); y1 <- Gen.chooseNum(y0, 1500L)
    } yield (x0, x1, y0, y1)).sample.getOrElse(Nil)
    boxes.foreach { case (x0, x1, y0, y1) =>
      val buckets = Layout.bucketsForBox(spec, x0, x1, y0, y1).toSet
      val points = Gen.listOfN(40,
        Gen.zip(Gen.chooseNum(x0, x1), Gen.chooseNum(y0, y1)))
        .sample.getOrElse(Nil)
      points.foreach { case (x, y) =>
        val b = Layout.interleaveL(
          Layout.quantizeL(x, spec.xLo, spec.xHi) >> 12,
          Layout.quantizeL(y, spec.yLo, spec.yHi) >> 12, 4)
        assert(buckets.contains(b),
          s"point ($x,$y) bucket $b outside enumeration for box " +
            s"($x0..$x1, $y0..$y1)")
      }
    }
  }
}
