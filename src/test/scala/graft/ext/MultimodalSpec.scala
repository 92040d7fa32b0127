package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binaryMeta: byte length, digest, and head bytes of binary payloads") {
    val df = Seq("hello").toDF("text")
      .select(Multimodal.binaryMeta(col("text").cast("binary")): _*)
    val r = df.head()
    assert(r.getInt(0) == 5)
    assert(r.getString(1) == "5d41402abc4b2a76b9719d911017c592")
    assert(r.getString(2) == "68656C6C6F")
  }

  test("fakeDecodeFeatures: exact schema, dimension, determinism, range") {
    val df = Seq("imgbytes-a", "imgbytes-b").toDF("t")
      .select(Multimodal.fakeDecodeFeatures(col("t").cast("binary"), 8).as("f"))
    assert(df.schema("f").dataType.asInstanceOf[ArrayType].elementType == FloatType,
      "decoder stub must produce the real extractor's schema: array<float>")
    val rows = df.as[Seq[Float]].collect()
    assert(rows.forall(_.length == 8))
    assert(rows.forall(_.forall(v => v >= 0f && v < 1f)))
    assert(rows(0) != rows(1), "different payloads, different features")
    val again = df.as[Seq[Float]].collect()
    assert(rows.toSeq == again.toSeq, "deterministic")
  }

  test("array<float> features survive join and aggregation") {
    val feats = Seq((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f))).toDF("id", "f")
    val meta = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    val out = feats.join(meta, "id")
      .groupBy("tag").agg(first("f").as("f"))
      .orderBy("tag").as[(String, Seq[Float])].collect()
    assert(out.toSeq == Seq(("x", Seq(1f, 2f)), ("y", Seq(3f, 4f))))
  }
}
