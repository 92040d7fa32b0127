package graft.ext

import org.scalacheck.Gen
import graft.SparkSpec

/** Pins [[Multimodal.AviCodec]]'s container contract: bit-exact
  * round-trips through the DIB conventions (bottom-up rows, BGR,
  * 4-byte stride padding — widths are chosen so every padding residue
  * 0..3 is hit), spec-shaped header fields at their absolute offsets,
  * and loud rejection of corrupt or unsupported bytes. */
class AviCodecSpec extends SparkSpec {

  import Multimodal.AviCodec

  private def synthFrames(n: Int, w: Int, h: Int,
      seed: Int): Array[Array[Byte]] =
    Array.tabulate(n) { f =>
      Array.tabulate(w * h * 3)(i => ((i * 31 + f * 97 + seed) & 0xff)
        .toByte)
    }

  test("round-trip is bit-exact across all four stride residues") {
    for (w <- Seq(4, 5, 6, 7); h <- Seq(1, 3, 8)) {
      val frames = synthFrames(3, w, h, seed = w * 100 + h)
      val (dw, dh, dec) = AviCodec.decode(
        AviCodec.encode(w, h, frames, fps = 25))
      assert(dw == w && dh == h && dec.length == 3, s"${w}x$h")
      frames.zip(dec).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.util.Arrays.equals(a, b), s"frame $i at ${w}x$h")
      }
    }
  }

  test("header fields land where the spec puts them") {
    val bytes = AviCodec.encode(6, 8, synthFrames(2, 6, 8, 1), fps = 10)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(off: Int): String =
      new String(bytes.slice(off, off + 4), "US-ASCII")
    assert(fcc(0) == "RIFF" && fcc(8) == "AVI ")
    assert(bb.getInt(4) == bytes.length - 8, "RIFF size covers the file")
    assert(fcc(12) == "LIST" && fcc(20) == "hdrl" && fcc(24) == "avih")
    assert(bb.getInt(32) == 100000, "microseconds per frame at 10 fps")
    assert(bb.getInt(48) == 2, "avih total frames")
    assert(bb.getInt(64) == 6 && bb.getInt(68) == 8, "avih dims")
    // strf BITMAPINFOHEADER: hdrl(12) + avih(24..87) + LIST strl at 88
    val strf = 88 + 12 + 8 + 56
    assert(fcc(strf) == "strf" && bb.getInt(strf + 8) == 40)
    assert(bb.getShort(strf + 22) == 24, "24-bit DIB")
    assert(bb.getInt(strf + 24) == 0, "BI_RGB")
  }

  test("idx1 offsets point at the movi frame chunks") {
    val w = 6; val h = 8
    val bytes = AviCodec.encode(w, h, synthFrames(3, w, h, 2), fps = 12)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dib = (w * 3 + 3) / 4 * 4 * h
    // movi list begins right after the 200-byte hdrl: RIFF(12) + 200.
    val moviFcc = 12 + 200 + 8
    assert(new String(bytes.slice(moviFcc, moviFcc + 4), "US-ASCII")
      == "movi")
    val idx1 = moviFcc + 4 + 3 * (8 + dib)
    assert(new String(bytes.slice(idx1, idx1 + 4), "US-ASCII") == "idx1")
    for (f <- 0 until 3) {
      val off = bb.getInt(idx1 + 8 + f * 16 + 8)
      val at = moviFcc + off
      assert(new String(bytes.slice(at, at + 4), "US-ASCII") == "00db",
        s"idx entry $f resolves to a frame chunk")
    }
  }

  test("corrupt and unsupported inputs are rejected with reasons") {
    val good = AviCodec.encode(6, 8, synthFrames(2, 6, 8, 3), fps = 12)
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](AviCodec.decode(b)).getMessage
    assert(msg("RIFX".getBytes ++ good.drop(4)).contains("RIFF"))
    assert(msg(good.take(8) ++ "WAVE".getBytes ++ good.drop(12))
      .contains("AVI"))
    assert(msg(good.take(good.length / 2)).contains("overruns"))
    // flip the '00db' frame fourccs to '00dc' (compressed)
    val dc = good.clone()
    var i = 0
    var flipped = 0
    while (i + 4 <= dc.length) {
      if (dc(i) == '0' && dc(i + 1) == '0' && dc(i + 2) == 'd' &&
          dc(i + 3) == 'b') { dc(i + 3) = 'c'; flipped += 1 }
      i += 1
    }
    assert(flipped >= 2 && msg(dc).contains("compressed"))
    // 8-bit depth in strf
    val shallow = good.clone()
    val strf = 88 + 12 + 8 + 56
    shallow(strf + 22) = 8
    assert(msg(shallow).contains("bits=8"))
  }

  test("property: random frame content survives; encoder rejects bad args") {
    val gen = Gen.listOfN(2 * 5 * 4 * 3, Gen.chooseNum(-128, 127))
    for (_ <- 0 until 20) {
      val px = gen.sample.getOrElse(Nil).map(_.toByte).toArray
      if (px.length == 2 * 5 * 4 * 3) {
        val frames = Array(px.take(5 * 4 * 3), px.drop(5 * 4 * 3))
        val (_, _, dec) =
          AviCodec.decode(AviCodec.encode(5, 4, frames, 30))
        assert(dec.zip(frames).forall { case (a, b) =>
          java.util.Arrays.equals(a, b) })
      }
    }
    intercept[IllegalArgumentException](
      AviCodec.encode(0, 4, synthFrames(1, 5, 4, 0), 30))
    intercept[IllegalArgumentException](
      AviCodec.encode(5, 4, Array(Array[Byte](1, 2, 3)), 30))
  }
}
