package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import graft.SparkSpec

/** Property coverage for the exactness claims [[CharBagOverlap]]'s
  * filter derivation rests on (JVM-side compute — the SQL/codegen path
  * is exercised by JaroWinklerSpec's brute-force-equality test and the
  * e12 oracle gate).
  */
class CharBagOverlapSpec extends SparkSpec {

  private def I(a: String, b: String): Int =
    CharBagOverlap.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  private def refBag(a: String, b: String): Int = {
    val ca = a.getBytes("UTF-8").groupBy(identity).view.mapValues(_.length)
    val cb = b.getBytes("UTF-8").groupBy(identity).view.mapValues(_.length)
    ca.map { case (c, n) => math.min(n, cb.getOrElse(c, 0)) }.sum
  }

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.listOfN(12, Gen.alphaChar).map(_.mkString),
    Gen.listOfN(8, Gen.oneOf('a', 'b', ' ', 'z', 'é')).map(_.mkString),
    Gen.const(""), Gen.asciiPrintableStr.map(_.take(30)))

  test("SQL registration evaluates") {
    val r = spark.sql(
      "SELECT char_bag_overlap('abcabc', 'cabx') AS i").head().getInt(0)
    assert(r == 3, s"got $r") // a, b, c each once; x unmatched
  }

  test("property: equals the reference multiset intersection; symmetric") {
    val pairs = Gen.listOfN(300, Gen.zip(strGen, strGen))
      .sample.getOrElse(Nil)
    for ((a, b) <- pairs) {
      assert(I(a, b) == refBag(a, b), s"I('$a','$b')")
      assert(I(a, b) == I(b, a), s"symmetry on ('$a','$b')")
    }
  }

  test("property: Jaro match count never exceeds the bag intersection") {
    // The filter's load-bearing inequality m <= I, probed through the
    // JW value: JW >= theta must imply the char-bag condition
    // I*(la+lb) >= (5*theta-3)*la*lb for every theta the filter could
    // be configured with.
    val pairs = Gen.listOfN(400, Gen.zip(strGen, strGen))
      .sample.getOrElse(Nil)
    for ((a, b) <- pairs; theta <- Seq(0.7, 0.8, 0.88, 0.95)) {
      val jw = JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      if (jw >= theta) {
        val la = a.getBytes("UTF-8").length.toDouble
        val lb = b.getBytes("UTF-8").length.toDouble
        val i = I(a, b).toDouble
        assert(i * (la + lb) >= (5 * theta - 3) * la * lb - 1e-9,
          s"filter would lose ('$a','$b') at theta=$theta (jw=$jw)")
      }
    }
  }
}
