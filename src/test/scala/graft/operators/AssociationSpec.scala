package graft.operators

import graft.SparkSpec

/** Closed-form checks of the a-priori rule miner. */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  // baskets: o1={A,B}, o2={A,B}, o3={A,C}, o4={B}
  private def baskets = Seq(
    (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (3L, "C"),
    (4L, "B")).toDF("o", "b")

  test("associationRules computes support/confidence/lift closed-form") {
    // sup(A)=3, sup(B)=3, C pruned at minSup=2; pair (A,B)=2 of 4 orders:
    // conf both ways 2/3, lift = 2·4/(3·3) = 8/9.
    val got = Advanced.associationRules(baskets, minSup = 2, k = 10)
      .as[(String, String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(("A", "B", 2L, 0.6667, 0.6667, 0.8889)), s"got $got")
  }

  test("a-priori minSup prunes both items and pairs") {
    // at minSup=3 the (A,B) pair (support 2) dies even though both
    // items survive the item pass.
    assert(Advanced.associationRules(baskets, minSup = 3, k = 10).count() == 0L)
  }
}
