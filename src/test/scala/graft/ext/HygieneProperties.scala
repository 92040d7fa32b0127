package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** Property-style checks for the deterministic prep/hygiene primitives —
  * each property evaluated over one generated batch in a single
  * DataFrame pass (per-sample Spark jobs would be pathologically slow).
  */
class HygieneProperties extends SparkSpec {
  import spark.implicits._

  test("property: splitBucket stays in [0,1) across the FULL long range") {
    // Includes ids whose product id·2654435761 wraps the long sign —
    // the regime a >2³¹-document corpus actually hits.
    val ids = Gen.listOfN(200, Gen.oneOf(
      Gen.chooseNum(0L, 5000L),
      Gen.chooseNum(0L, Long.MaxValue),
      Gen.const(Long.MaxValue), Gen.const(3500000000L)))
      .sample.getOrElse(Nil)
    val got = ids.toDF("id")
      .select(TrainPrep.splitBucket($"id").as("u")).as[Double].collect()
    assert(got.forall(u => u >= 0.0 && u < 1.0),
      s"out-of-range buckets: ${got.filter(u => u < 0.0 || u >= 1.0).take(5).toSeq}")
  }

  test("property: splitBucket is partitioning-invariant") {
    val df = (0L until 1000L).toDF("id")
    val a = df.select($"id", TrainPrep.splitBucket($"id").as("u"))
      .as[(Long, Double)].collect().toMap
    val b = df.repartition(13).select($"id", TrainPrep.splitBucket($"id").as("u"))
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("property: piiRedact is idempotent and introduces no new matches") {
    val word = Gen.oneOf(Gen.alphaStr, Gen.numStr,
      Gen.const("a@b.co"), Gen.const("555-123-4567"),
      Gen.const("10.0.0.1"), Gen.const("1.2.3"), Gen.const("12-34-5678"))
    val text = Gen.listOfN(8, word).map(_.mkString(" "))
    val samples = Gen.listOfN(120, text).sample.getOrElse(Nil)
    val out = samples.toDF("text")
      .select(Hygiene.piiRedact($"text").as("r1"))
      .withColumn("r2", Hygiene.piiRedact($"r1"))
      .as[(String, String)].collect()
    out.foreach { case (r1, r2) =>
      assert(r1 == r2, s"not idempotent: '$r1' -> '$r2'")
    }
  }
}
