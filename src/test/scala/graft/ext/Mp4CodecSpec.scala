package graft.ext

import graft.SparkSpec

/** Pins [[Multimodal.Mp4Codec]]'s container contract: bit-exact
  * sample round-trips through the four stbl tables for both chunk
  * parities (even = uniform stsc, odd = remainder-chunk entry), exact
  * stts-derived pts, box walking by declared size (payload bytes that
  * spell box magics cannot desynchronize it), and loud rejection of
  * corrupt bytes. */
class Mp4CodecSpec extends SparkSpec {

  import Multimodal.Mp4Codec

  private def synthSamples(n: Int, seed: Int): Array[Array[Byte]] =
    Array.tabulate(n) { f =>
      Array.tabulate(40 + 7 * f)(i => ((i * 31 + f * 97 + seed) & 0xff)
        .toByte)
    }

  test("round-trip is bit-exact for even and odd sample counts") {
    for (n <- Seq(1, 2, 5, 6)) {
      val samples = synthSamples(n, seed = n)
      val (ts, dec) = Mp4Codec.decode(
        Mp4Codec.encode(samples, timescale = 600, delta = 100))
      assert(ts == 600 && dec.length == n, s"n=$n")
      dec.zip(samples).zipWithIndex.foreach { case (((pts, b), src), f) =>
        assert(pts == 100L * f, s"pts of sample $f at n=$n")
        assert(java.util.Arrays.equals(b, src), s"sample $f at n=$n")
      }
    }
  }

  test("payload bytes spelling box magics cannot desynchronize the walk") {
    val evil = "moovmdatstblstco".getBytes ++ Array.fill(40)(0x6d.toByte)
    val (_, dec) = Mp4Codec.decode(
      Mp4Codec.encode(Array(evil, evil), timescale = 90000, delta = 3000))
    assert(dec.length == 2 &&
      dec.forall(s => java.util.Arrays.equals(s._2, evil)))
  }

  test("chunk offsets and sizes resolve through the stsc remainder") {
    // 5 samples → chunks of (2,2,1); demux must re-derive each
    // sample's absolute offset from stco + preceding sizes alone.
    val samples = synthSamples(5, seed = 9)
    val bytes = Mp4Codec.encode(samples, timescale = 24, delta = 1)
    val (_, dec) = Mp4Codec.decode(bytes)
    assert(dec.map(_._2.length).toSeq === samples.map(_.length).toSeq)
  }

  test("corrupt bytes fail loudly") {
    val good = Mp4Codec.encode(synthSamples(4, seed = 1), 600, 100)
    intercept[IllegalArgumentException] { // truncated: moov lost
      Mp4Codec.decode(good.dropRight(12))
    }
    val noFtyp = java.util.Arrays.copyOf(good, good.length)
    noFtyp(4) = 'x'.toByte // ftyp → xtyp
    intercept[IllegalArgumentException] {
      Mp4Codec.decode(noFtyp)
    }
    intercept[RuntimeException] { // stco size corrupted past parent
      val bad = java.util.Arrays.copyOf(good, good.length)
      // find stco and inflate its declared size
      val idx = bad.sliding(4).indexWhere(w =>
        w.sameElements("stco".getBytes))
      bad(idx - 4) = 0x7f.toByte
      Mp4Codec.decode(bad)
    }
  }
}
