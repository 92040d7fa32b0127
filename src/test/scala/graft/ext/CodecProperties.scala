package graft.ext

import org.scalacheck.Gen
import graft.SparkSpec

/** Property-style round-trip checks for the pure-JVM media codecs —
  * arbitrary shapes and contents, not just the fixture geometries the
  * oracle queries use. Plain JVM loops (no Spark jobs): the codecs are
  * per-row kernels, so the property surface is the function itself.
  */
class CodecProperties extends SparkSpec {

  test("property: WavCodec round-trips arbitrary PCM16 clips") {
    val gen = for {
      n <- Gen.chooseNum(0, 2000)
      rate <- Gen.oneOf(8000, 16000, 44100)
      samples <- Gen.listOfN(n,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (rate, samples.map(_.toShort).toArray)
    (1 to 50).foreach { _ =>
      val (rate, samples) = gen.sample.getOrElse((8000, Array.empty[Short]))
      val (gotRate, got) =
        Multimodal.WavCodec.decode(Multimodal.WavCodec.encode(samples, rate))
      assert(gotRate == rate && got.toSeq == samples.toSeq,
        s"WAV round-trip broke at n=${samples.length} rate=$rate")
    }
  }

  test("property: PngCodec round-trips arbitrary RGB images") {
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
      bytes <- Gen.listOfN(w * h * 3, Gen.chooseNum(0, 255))
    } yield (w, h, bytes.map(_.toByte).toArray)
    (1 to 30).foreach { _ =>
      val (w, h, rgb) = gen.sample.getOrElse((1, 1, Array[Byte](0, 0, 0)))
      val (dw, dh, got) =
        Multimodal.PngCodec.decode(Multimodal.PngCodec.encode(w, h, rgb))
      assert((dw, dh) == (w, h) && got.toSeq == rgb.toSeq,
        s"PNG round-trip broke at ${w}x$h")
    }
  }

  test("property: JPEG interop holds for ARBITRARY content both ways " +
      "— JDK and own decoder agree on own-encoder and JDK-encoder " +
      "bytes (lossy, so agreement not round-trip is the invariant)") {
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
      // mix structured and noise content: noise is JPEG's worst case
      // and exactly where a coefficient/entropy bug would surface
      mode <- Gen.oneOf("noise", "smooth", "blocks")
      seed <- Gen.chooseNum(0, 1 << 20)
    } yield (w, h, mode, seed)
    def content(w: Int, h: Int, mode: String, seed: Int): Array[Byte] =
      Array.tabulate(w * h * 3) { i =>
        val px = i / 3; val x = px % w; val y = px / w
        (mode match {
          case "noise" => (seed * 2654435761L + i * 40503L) >>> 24
          case "smooth" =>
            64 + (x * 96) / math.max(w - 1, 1) +
              (y * 64) / math.max(h - 1, 1) + (seed & 15)
          case _ =>
            if ((((x / 8) + (y / 8)) & 1) == 0) 50 + (seed & 31) else 200
        }).toInt.toByte
      }
    (1 to 25).foreach { _ =>
      val (w, h, mode, seed) =
        gen.sample.getOrElse((8, 8, "smooth", 1))
      val rgb = content(w, h, mode, seed)
      for ((bytes, enc) <- Seq(
          (Multimodal.JpegEncoder.encode(w, h, rgb, 90), "own"),
          (Multimodal.imageioJpegBytes(w, h, rgb, 0.9f), "jdk"))) {
        val ref = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        assert(ref != null && ref.getWidth == w && ref.getHeight == h,
          s"$enc/$mode ${w}x$h: JDK decoder rejected the stream")
        val (dw, dh, mine) = Multimodal.JpegCodec.decode(bytes)
        assert((dw, dh) == (w, h), s"$enc/$mode: dims $dw x $dh")
        var maxD = 0
        for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
          val px = ref.getRGB(x, y)
          val rd = Seq((px >> 16) & 0xff, (px >> 8) & 0xff,
            px & 0xff)(c)
          val d = math.abs((mine((y * w + x) * 3 + c) & 0xff) - rd)
          if (d > maxD) maxD = d
        }
        // own-encoder bytes are 4:4:4 (IDCT rounding only); the JDK
        // writer subsamples chroma, where noise content pushes the
        // upsampling-phase difference a little wider
        val bound = if (enc == "own") 4 else 8
        assert(maxD <= bound,
          s"$enc/$mode ${w}x$h seed=$seed: decoders diverge by $maxD")
      }
    }
  }

  test("property: GifCodec round-trips arbitrary paletted images " +
      "(all sizes, skewed palettes, low-entropy runs)") {
    val pal = new Array[Byte](768)
    (0 until 256).foreach { i =>
      pal(i * 3) = i.toByte
      pal(i * 3 + 1) = ((i * 7 + 3) % 256).toByte
      pal(i * 3 + 2) = ((255 - i) % 256).toByte
    }
    val gen = for {
      w <- Gen.chooseNum(1, 70)
      h <- Gen.chooseNum(1, 70)
      // three content regimes: full-range noise (dictionary growth),
      // a tiny alphabet (long LZW chains + KwKwK), constant runs
      mode <- Gen.oneOf(0, 1, 2)
      bytes <- Gen.listOfN(w * h, mode match {
        case 0 => Gen.chooseNum(0, 255)
        case 1 => Gen.oneOf(7, 8, 9)
        case 2 => Gen.const(42)
      })
    } yield (w, h, bytes.map(_.toByte).toArray)
    (1 to 40).foreach { _ =>
      val (w, h, idx) = gen.sample.getOrElse((1, 1, Array[Byte](0)))
      val (dw, dh, got, dpal) =
        Multimodal.GifCodec.decode(Multimodal.GifCodec.encode(w, h, idx, pal))
      assert((dw, dh) == (w, h) && got.toSeq == idx.toSeq &&
        dpal.toSeq == pal.toSeq,
        s"GIF round-trip broke at ${w}x$h n=${idx.length}")
    }
  }

  test("property: boxDownsample2x sums are conserved within flooring " +
      "loss and every output value is the floor mean of its block") {
    val gen = for {
      w <- Gen.chooseNum(1, 20).map(_ * 2) // even dims
      h <- Gen.chooseNum(1, 20).map(_ * 2)
      bytes <- Gen.listOfN(w * h * 3, Gen.chooseNum(0, 255))
    } yield (w, h, bytes.map(_.toByte).toArray)
    (1 to 30).foreach { _ =>
      val (w, h, rgb) = gen.sample.getOrElse((2, 2, new Array[Byte](12)))
      val (ow, oh, ds) = Multimodal.boxDownsample2x(w, h, rgb)
      assert((ow, oh) == (w / 2, h / 2))
      for (y <- 0 until oh; x <- 0 until ow; c <- 0 until 3) {
        val s = (rgb(((2 * y) * w + 2 * x) * 3 + c) & 0xff) +
          (rgb(((2 * y) * w + 2 * x + 1) * 3 + c) & 0xff) +
          (rgb(((2 * y + 1) * w + 2 * x) * 3 + c) & 0xff) +
          (rgb(((2 * y + 1) * w + 2 * x + 1) * 3 + c) & 0xff)
        assert((ds((y * ow + x) * 3 + c) & 0xff) == s / 4)
      }
    }
  }
}
