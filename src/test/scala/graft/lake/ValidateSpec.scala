package graft.lake

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("validate compiles the suite to one pass and reports per-check") {
    val df = Seq((1L, Option("a")), (2L, Option("b")), (2L, None))
      .toDF("k", "v")
    val got = Validate.validate(df, Seq(
      Validate.Check("complete_v", Validate.completeness("v"), _ === 1.0),
      Validate.Check("unique_k", Validate.uniqueness(Seq("k")), _ === 1.0),
      Validate.Check("range_k", Validate.inRange("k", 0, 10), _ === 1.0)))
      .as[(String, Double, Boolean)].collect().toMap2
    assert(got("complete_v") == (0.666667, false))
    assert(got("unique_k") == (0.666667, false))
    assert(got("range_k") == (1.0, true))
  }

  test("refIntegrity counts orphans via anti-join") {
    val child = Seq(1L, 2L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = Validate.refIntegrity(child, "fk", parent, "pk")
      .as[(String, Double, Boolean)].head()
    assert(row == ("ri_fk", 0.666667, false))
    val clean = Validate.refIntegrity(child.filter($"fk" < 3), "fk",
      parent, "pk").as[(String, Double, Boolean)].head()
    assert(clean == ("ri_fk", 1.0, true))
  }

  private implicit class ToMap2(
      rows: Array[(String, Double, Boolean)]) {
    def toMap2: Map[String, (Double, Boolean)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
