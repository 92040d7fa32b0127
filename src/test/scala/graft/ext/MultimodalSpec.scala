package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("decodePpm parses a hand-built P6 image and averages channels") {
    import spark.implicits._
    // 2x2 image: all-red, all-green, all-blue, white
    val px = Array[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)
    val img = "P6\n2 2\n255\n".getBytes("UTF-8") ++ px
    val out = Multimodal.decodePpm(
      Seq((7L, img)).toDF("doc_id", "img"), "doc_id", "img").head()
    assert(out == Multimodal.PpmStats(7L, 2, 2, 127.5, 127.5, 127.5))
    // comment + multi-digit dims parse too
    val (w, h, off) = Multimodal.PpmParser.header(
      "P6\n# a comment\n640 480\n255\n".getBytes("UTF-8"))
    assert((w, h) == ((640, 480)))
    assert(off == "P6\n# a comment\n640 480\n255\n".length)
    // non-P6 input fails loudly, never decodes garbage
    intercept[IllegalArgumentException] {
      Multimodal.PpmParser.header("JFIF....".getBytes("UTF-8"))
    }
  }
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

  test("decodePartitioned: batched decode keeps schema, ids, and determinism") {
    val df = Seq((1L, "payload-one"), (2L, "payload-two"), (3L, "p3"))
      .toDF("doc_id", "t")
      .withColumn("bin", col("t").cast("binary"))
      .repartition(2) // decode must be partition-parallel
    val out = Multimodal.decodePartitioned(df, "doc_id", "bin", dim = 16)
    val rows = out.collect().sortBy(_.doc_id)
    assert(rows.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).n_bytes == 11 && rows(2).n_bytes == 2)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(_.features.forall(v => v >= 0f && v < 1f)))
    assert(!rows(0).features.sameElements(rows(1).features))
    val again = Multimodal.decodePartitioned(df, "doc_id", "bin", 16)
      .collect().sortBy(_.doc_id)
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("resize and frame-sample stubs preserve the media transform shapes") {
    val df = Seq("0123456789abcdef").toDF("t")
      .withColumn("bin", col("t").cast("binary"))
    val resized = df.select(Multimodal.resizeStub(col("bin"), 4).as("r"))
      .head().getAs[Array[Byte]]("r")
    assert(new String(resized) == "0123")
    val frames = df.select(
      Multimodal.frameSampleStub(col("bin"), frameBytes = 4, nFrames = 3).as("f"))
      .head().getSeq[Array[Byte]](0)
    assert(frames.map(b => new String(b)) == Seq("0123", "4567", "89ab"))
  }

  test("frameSample slices stride-th frames and zero-pads the tail") {
    // 6 bytes of payload over a 4-frame × 4-byte layout, stride 2:
    // frame 0 = bytes 0-3 (values 10,20,30,40), frame 2 = all padding.
    val df = Seq((7L, Array[Byte](10, 20, 30, 40, 50, 60))).toDF("id", "bin")
    val got = Multimodal.frameSample(df, "id", "bin",
        frameBytes = 4, nFrames = 4, stride = 2)
      .collect().sortBy(_.frame_idx).toSeq
    assert(got.map(_.frame_idx) == Seq(0, 2), "stride-2 sample of 4 frames")
    assert(got(0).mean_b == 25.0 && got(0).max_b == 40, s"got ${got(0)}")
    assert(got(1).mean_b == 0.0 && got(1).max_b == 0,
      "past-payload frame must be all zero padding")
  }

  test("array<float> features survive join and aggregation") {
    val feats = Seq((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f))).toDF("id", "f")
    val meta = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    val out = feats.join(meta, "id")
      .groupBy("tag").agg(first("f").as("f"))
      .orderBy("tag").as[(String, Seq[Float])].collect()
    assert(out.toSeq == Seq(("x", Seq(1f, 2f)), ("y", Seq(3f, 4f))))
  }

  test("ppmAHash thresholds each pixel against the image mean") {
    // 8×8 image, rows alternate bright (200,200,200) and dark (10,10,10):
    // bright pixels sit above the mean → bits set for rows 0,2,4,6.
    def img(bright: Int): Array[Byte] = {
      val px = Array.tabulate(64 * 3) { j =>
        val row = (j / 3) / 8
        (if (row % 2 == 0) bright else 10).toByte
      }
      "P6\n8 8\n255\n".getBytes("UTF-8") ++ px
    }
    val df = Seq((1L, img(200)), (2L, img(200)), (3L, img(201)))
      .toDF("doc_id", "img")
    val got = Multimodal.ppmAHash(df, "doc_id", "img")
      .collect().map(r => r.doc_id -> r.phash).toMap
    val expected = (0 until 64)
      .filter(i => (i / 8) % 2 == 0).map(1L << _).reduce(_ | _)
    assert(got(1L) == expected, f"got ${got(1L)}%016x want $expected%016x")
    assert(got(1L) == got(2L), "identical images hash identically")
    assert(java.lang.Long.bitCount(got(1L) ^ got(3L)) == 0,
      "a 1-unit brightness change flips no bit in this clear-margin image")
  }
}
