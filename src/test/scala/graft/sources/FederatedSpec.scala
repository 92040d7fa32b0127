package graft.sources

import graft.SparkSpec

class FederatedSpec extends SparkSpec {
  import spark.implicits._

  test("KeyValueSource: scan returns all items, lookup filters by key") {
    val kv = new Federated.KeyValueSource(spark, Seq(
      (1L, Map("v" -> "a")), (2L, Map("v" -> "b")), (3L, Map("v" -> "c"))))
    assert(kv.scan().count() == 3)
    val got = kv.lookup(Seq(1L, 3L)).select("kv_key").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L))
  }

  test("JDBC round trip through embedded Derby preserves rows") {
    val src = Seq((1, "x", 1.5), (2, "y", 2.5)).toDF("id", "s", "d")
    Federated.jdbcWrite(src, "spec_rt")
    val back = Federated.jdbcRead(spark, "spec_rt").orderBy("id")
    assert(back.count() == 2)
    val r = back.collect()
    assert(r(0).getAs[Int]("id") == 1 && r(0).getAs[String]("s") == "x")
    assert(r(1).getAs[Double]("d") == 2.5)
  }

  test("SourceRegistry unifies sources under names") {
    val reg = new Federated.SourceRegistry
    reg.register("a", () => Seq(1).toDF("x"))
    reg.register("b", () => Seq(1, 2).toDF("x"))
    assert(reg.names == Seq("a", "b"))
    assert(reg.table("b").count() == 2)
  }
}
