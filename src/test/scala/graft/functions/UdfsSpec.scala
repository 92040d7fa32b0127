package graft.functions

import graft.SparkSpec

class UdfsSpec extends SparkSpec {

  test("geoMean aggregator: zero, reduce, merge, finish semantics") {
    val a = Udfs.geoMean
    assert(a.finish(a.zero).isNaN, "empty group yields NaN")
    val b1 = a.reduce(a.reduce(a.zero, 2.0), 8.0)
    assert(math.abs(a.finish(b1) - 4.0) < 1e-12, "gm(2,8)=4")
    val left = a.reduce(a.zero, 2.0)
    val right = a.reduce(a.zero, 8.0)
    assert(math.abs(a.finish(a.merge(left, right)) - 4.0) < 1e-12,
      "merge is equivalent to a single partition")
  }

  test("vecCentroid aggregator: reduce/merge element-wise, empty-safe") {
    val a = Udfs.vecCentroid
    assert(a.finish(a.zero).isEmpty, "empty group yields empty vector")
    val b = a.reduce(a.reduce(a.zero, Seq(1f, 3f)), Seq(3f, 5f))
    assert(a.finish(b) == Seq(2.0, 4.0))
    val merged = a.merge(a.reduce(a.zero, Seq(1f, 3f)),
      a.reduce(a.zero, Seq(3f, 5f)))
    assert(a.finish(merged) == Seq(2.0, 4.0),
      "merge is equivalent to a single partition")
    assert(a.finish(a.merge(a.zero, a.reduce(a.zero, Seq(2f)))) == Seq(2.0),
      "merging with the zero buffer is identity")
  }

  test("registered functions evaluate through SQL") {
    Udfs.registerAll(spark)
    assert(spark.sql("SELECT discounted_price(100.0, 0.25)")
      .head().getDouble(0) == 75.0)
    val bigrams = spark.sql("SELECT bigrams('a b c') AS b")
      .head().getSeq[String](0)
    assert(bigrams == Seq("a b", "b c"))
    assert(spark.sql("SELECT bigrams('solo') AS b").head().getSeq[String](0).isEmpty)
  }
}
