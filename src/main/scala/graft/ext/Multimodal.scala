package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns (EXT, SURVEY §2.12 E5): media as opaque binary
  * with typed metadata, and `array<float>` embeddings flowing through
  * the relational operators unchanged.
  *
  * The decode step (image/audio → pixels/samples) is STUBBED — the
  * container has no media libraries — with a clearly-marked
  * deterministic fake. The Spark-side plumbing (schema, batching,
  * partition-parallel extraction, downstream joins/aggs over the
  * features) is real and oracle-tested.
  */
object Multimodal {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  /** Byte length / digest / head bytes of a binary column — the typed
    * metadata every media column carries. */
  def binaryMeta(bin: Column): Seq[Column] = Seq(
    length(bin).as("n_bytes"),
    md5(bin).as("digest"),
    upper(hex(substring(bin, 1, 8))).as("head8"))

  /** STUB media decoder: a real pipeline would decode pixels/samples
    * here (e.g. via a vectorized UDF batching rows per partition). This
    * deterministic fake derives `dim` floats in [0,1) from seeded hashes
    * of the bytes, preserving the exact schema and distribution shape a
    * real extractor produces: binary → array<float>, map-only. */
  def fakeDecodeFeatures(bin: Column, dim: Int): Column =
    transform(sequence(lit(1), lit(dim)),
      i => (pmod(xxhash64(bin, i), lit(1000000)).cast("double") / 1000000.0)
        .cast("float"))

  /** Typed record for the batched decode path. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      features: Array[Float])

  /** Partition-batched media decode — the Scala analogue of a vectorized
    * (mapInPandas-style) decode UDF: rows stream through mapPartitions
    * so a real codec would amortize its init (model load, decoder
    * context) once per partition and process in batches. The codec
    * itself is STUBBED (no media libs in this container) with the same
    * deterministic fake as [[fakeDecodeFeatures]]; the schema, batch
    * iteration, and partition-parallel shape are the real thing. */
  def decodePartitioned(df: DataFrame, idCol: String, binCol: String,
      dim: Int): Dataset[MediaFeatures] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens HERE in a real decoder (once, not per row)
        val decoderCtx = new StubDecoder(dim)
        rows.map { case (id, bytes) =>
          MediaFeatures(id, bytes.length, decoderCtx.decode(bytes))
        }
      }
  }

  /** STUB decoder: a real one wraps libjpeg/ffmpeg/an ONNX encoder.
    * Deterministic fake — features derived from byte content. */
  private final class StubDecoder(dim: Int) extends Serializable {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var j = 0
      while (j < dim) {
        // splitmix64 avalanche so trailing-byte differences reach all bits
        var v = h + (j + 1) * 0x9e3779b97f4a7c15L
        v = (v ^ (v >>> 30)) * 0xbf58476d1ce4e5b9L
        v = (v ^ (v >>> 27)) * 0x94d049bb133111ebL
        v ^= v >>> 31
        out(j) = ((v >>> 40) % 1000000L).toFloat / 1000000f
        j += 1
      }
      out
    }
  }

  /** REAL image decode for the one format that needs no codec library:
    * binary PPM (P6 — "P6\n<w> <h>\n<maxval>\n" header, then raw RGB
    * bytes). Pure-JVM parser, so unlike the stubbed codec paths this
    * one decodes actual pixels and is value-level oracle-checked. */
  final case class PpmStats(doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  private[ext] object PpmParser extends Serializable {
    /** Parse a P6 header → (width, height, pixel-data offset). Fails
      * loudly on anything that is not an 8-bit P6 image. */
    def header(b: Array[Byte]): (Int, Int, Int) = {
      require(b.length >= 2 && b(0) == 'P' && b(1) == '6', "not a P6 PPM")
      var i = 2
      def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
      def nextInt(): Int = {
        while (i < b.length && (isWs(b(i)) || b(i) == '#'))
          if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
          else i += 1
        var v = 0
        while (i < b.length && b(i) >= '0' && b(i) <= '9') {
          v = v * 10 + (b(i) - '0'); i += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h") // nextInt's 0 = no digits
      require(maxval == 255, s"unsupported maxval $maxval")
      require(i < b.length && isWs(b(i)),
        "maxval must be followed by a single whitespace byte")
      i += 1 // the single whitespace byte separating header from pixels
      (w, h, i)
    }
  }

  /** Partition-batched REAL PPM decode: parses each image's header and
    * averages the R/G/B channels over its pixels. Same mapPartitions
    * shape as [[decodePartitioned]] — at scale the parser/codec context
    * initializes once per partition and rows stream through. */
  def decodePpm(df: DataFrame, idCol: String, binCol: String): Dataset[PpmStats] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        def round4(x: Double): Double =
          BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        rows.map { case (id, bytes) =>
          val (w, h, off) = PpmParser.header(bytes)
          val n = w * h
          // EXACT length: a mis-parsed offset (e.g. stray bytes between
          // header and pixels) must fail loudly, never average garbage
          require(bytes.length == off + 3 * n,
            s"pixel payload ${bytes.length - off} bytes, expected ${3 * n}")
          var sr = 0L; var sg = 0L; var sb = 0L
          var j = 0
          while (j < n) {
            sr += bytes(off + 3 * j) & 0xff
            sg += bytes(off + 3 * j + 1) & 0xff
            sb += bytes(off + 3 * j + 2) & 0xff
            j += 1
          }
          PpmStats(id, w, h,
            round4(sr.toDouble / n), round4(sg.toDouble / n),
            round4(sb.toDouble / n))
        }
      }
  }

  /** Typed record for the decoded-feature path. */
  final case class PpmRowFeatures(doc_id: Long, v: Array[Double])

  /** REAL feature extraction from decoded pixels: one feature per image
    * row (the mean of that row's 3·w channel bytes) — a genuine
    * pixels→vector encoder, not a stub, so the whole
    * multimodal→similarity pipeline is value-level checkable. Same
    * mapPartitions batching as the other decoders. */
  def decodePpmRowFeatures(df: DataFrame, idCol: String,
      binCol: String): Dataset[PpmRowFeatures] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (w, h, off) = PpmParser.header(bytes)
          require(bytes.length == off + 3 * w * h,
            s"pixel payload ${bytes.length - off} bytes, expected ${3 * w * h}")
          val v = new Array[Double](h)
          var r = 0
          while (r < h) {
            var sum = 0L
            var j = 0
            while (j < 3 * w) {
              sum += bytes(off + r * 3 * w + j) & 0xff
              j += 1
            }
            v(r) = sum.toDouble / (3 * w)
            r += 1
          }
          PpmRowFeatures(id, v)
        }
      }
  }

  /** Typed record for the perceptual-hash path. */
  final case class PhashRow(doc_id: Long, phash: Long)

  /** REAL perceptual average-hash (aHash) over decoded P6 pixels. The
    * classic recipe downscales to 8×8 then thresholds each cell
    * against the mean — these images ARE 8×8, so the grid is the
    * image: bit i = (64·sᵢ > Σs) where sᵢ is pixel i's integer
    * r+g+b sum. Pure integer arithmetic end to end, so the 64-bit
    * fingerprint is engine- and partitioning-deterministic. Same
    * mapPartitions batching as the other decoders (codec init
    * amortizes per partition). */
  def ppmAHash(df: DataFrame, idCol: String,
      binCol: String): Dataset[PhashRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (w, h, off) = PpmParser.header(bytes)
          val n = w * h
          require(n == 64, s"aHash grid expects 8x8, got ${w}x$h")
          require(bytes.length == off + 3 * n,
            s"pixel payload ${bytes.length - off} bytes, expected ${3 * n}")
          val s = new Array[Long](n)
          var tot = 0L
          var i = 0
          while (i < n) {
            s(i) = (bytes(off + 3 * i) & 0xff) +
              (bytes(off + 3 * i + 1) & 0xff) +
              (bytes(off + 3 * i + 2) & 0xff)
            tot += s(i)
            i += 1
          }
          var hash = 0L
          i = 0
          while (i < n) {
            if (64L * s(i) > tot) hash |= (1L << i)
            i += 1
          }
          PhashRow(id, hash)
        }
      }
  }

  /** STUB media resize: binary → binary (a real one re-encodes pixels;
    * the fake truncates deterministically, preserving the shape of the
    * transform: binary in, smaller binary out, map-only). */
  def resizeStub(bin: Column, maxBytes: Int): Column =
    substring(bin, 1, maxBytes)

  /** STUB frame sampling: binary "video" → array<binary> of frames
    * (fixed-stride chunks; a real one keyframe-samples). */
  def frameSampleStub(bin: Column, frameBytes: Int, nFrames: Int): Column =
    transform(sequence(lit(0), lit(nFrames - 1)),
      i => bin.substr(i * frameBytes + 1, lit(frameBytes)))

  /** Typed record for one sampled video frame. */
  final case class FrameStats(doc_id: Long, frame_idx: Int,
      mean_b: Double, max_b: Int)

  /** Video frame sampling with REAL binary plumbing — the training-
    * pipeline shape for clip ingestion: a fixed-layout binary "video"
    * (`nFrames` frames × `frameBytes` bytes, zero-padded) streams
    * through mapPartitions, every `stride`-th frame is sliced out (a
    * real sampler keyframe-picks; the slice arithmetic, batching, and
    * per-partition decoder-init site are the real thing), and each
    * sampled frame emits per-frame byte statistics. Map-only with a
    * bounded ≤ nFrames/stride fan-out per row — at 100 TB this is one
    * pass, no shuffle until the caller's rollup.
    *
    * The downstream scene-cut signal (|Δ mean| between consecutive
    * sampled frames) is left to the caller's window — see
    * [[Multimodal.queries e5_frame_sample]]. */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, nFrames: Int, stride: Int): Dataset[FrameStats] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // a real decoder opens its codec context HERE, once per partition
        rows.flatMap { case (id, bytes) =>
          (0 until nFrames by stride).iterator.map { f =>
            var sum = 0L
            var max = 0
            var i = f * frameBytes
            val end = i + frameBytes
            while (i < end) {
              val b = if (i < bytes.length) bytes(i) & 0xff else 0
              sum += b
              if (b > max) max = b
              i += 1
            }
            // frameBytes is a power of two ⇒ the mean is exact in
            // doubles and the 4-decimal round is engine-stable
            FrameStats(id, f, sum.toDouble / frameBytes, max)
          }
        }
      }
  }

  // ------------------------------------------------------------ queries

  /** Byte/char equivalence guard for the oracle-shared byte queries:
    * Spark's `cast("binary")` yields UTF-8 BYTES while DuckDB's
    * strlen/substr/ord count CHARACTERS — identical only for pure-ASCII
    * text. Both engines therefore compute over an explicitly
    * ASCII-stripped projection (a no-op on today's corpus), so a future
    * non-ASCII document cannot silently diverge the gate. NULL passes
    * through (regexp_replace(NULL) is NULL on both engines). */
  private def asciiOnly(c: Column): Column =
    regexp_replace(c, "[^\\x00-\\x7F]", "")

  /** E5: binary passthrough — text bytes as an opaque binary column with
    * derived metadata (the oracle recomputes digests over the same
    * bytes). */
  private val e5BinaryMeta: Q = (s, dir) => {
    val bin = asciiOnly(col("text")).cast("binary")
    t(s, dir, "documents")
      .select(col("doc_id") +: binaryMeta(bin): _*)
      .orderBy(col("doc_id"))
  }

  /** E5b: `array<float>` through join + aggregation — embeddings joined
    * to document metadata, per (label, lang) squared-norm averages. The
    * vector column survives the join shuffle intact. */
  private val e5VectorJoin: Q = (s, dir) => {
    val v = transform(col("embedding"), _.cast("double"))
    val normSq = graft.functions.VecDot.vecDot(v, v)
    t(s, dir, "embeddings")
      .join(t(s, dir, "documents"), col("vec_id") === col("doc_id"))
      .groupBy(col("label"), col("lang"))
      .agg(count(lit(1)).as("n"),
        round(avg(normSq), 4).as("avg_norm_sq"))
      .orderBy(col("label"), col("lang"))
  }

  /** E5c: the batched decode path through the oracle gate — features
    * are stub-generated (not oracle-checkable) but id preservation and
    * byte accounting through mapPartitions are. */
  private val e5DecodeBatch: Q = (s, dir) =>
    decodePartitioned(
      t(s, dir, "documents")
        .withColumn("bin", asciiOnly(col("text")).cast("binary")),
      "doc_id", "bin", dim = 8)
      .toDF()
      .select(col("doc_id"), col("n_bytes"))
      .orderBy(col("doc_id"))

  /** E5d: REAL decode through the gate — 8×8 P6 images are constructed
    * from each document's bytes (zero-padded to 192 pixel bytes), the
    * pure-JVM parser decodes them, and DuckDB recomputes the channel
    * means from the same byte construction — a value-level oracle on
    * actual decoded pixels, not a stub. */
  // coalesce: a NULL text zero-pads to an all-zero image, matching
  // the oracle's CASE … ELSE 0 (a null binary would instead NPE the
  // decoder — engine divergence on a nullable column)
  private def ppmImage: Column = concat(
    lit("P6\n8 8\n255\n".getBytes("UTF-8")),
    rpad(substring(asciiOnly(coalesce(col("text"), lit("")))
        .cast("binary"), 1, 192),
      192, Array[Byte](0)))

  private val e5PpmDecode: Q = (s, dir) =>
    decodePpm(
      t(s, dir, "documents").withColumn("img", ppmImage), "doc_id", "img")
      .toDF()
      .orderBy(col("doc_id"))

  /** E5e: the full multimodal→similarity pipeline on REAL decoded
    * pixels — construct 8×8 P6 images, decode, extract one feature per
    * image row (row-mean luminance over the 24 channel bytes), cosine
    * top-3 for the first 5 docs. DuckDB recomputes features from the
    * same byte construction and re-ranks, so the decoder, the encoder,
    * and the search are all value-level gated end to end. Integer byte
    * sums divide exactly in doubles, so feature arithmetic is
    * bit-identical across engines. */
  private val e5Pipeline: Q = (s, dir) => {
    val feats = decodePpmRowFeatures(
      t(s, dir, "documents").withColumn("img", ppmImage),
      "doc_id", "img").toDF()
    val withN = feats.withColumn("nrm",
      sqrt(graft.functions.VecDot.vecDot(col("v"), col("v"))))
    val q = withN.filter(col("doc_id") < 5)
      .select(col("doc_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val c = withN.select(col("doc_id").as("c_id"), col("v").as("cv"),
      col("nrm").as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos", graft.functions.VecDot.vecDot(col("qv"), col("cv"))
        / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("cos"), 6).as("sim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  // ------------------------------------------------ audio spectral features

  final case class AudioFeatures(id: Long, n_samples: Int,
      dominant_bin: Int, band_low: Double, band_high: Double,
      parseval_err: Double)

  private val AudioN = 256 // samples per synthetic clip

  /** Deterministic PCM synth: a strong tone at bin (id % 100 + 3) plus
    * a weaker second harmonic, float64 samples packed to a BINARY
    * column — the audio-file stand-in (a real pipeline lands WAV/FLAC
    * bytes here; the byte-column plumbing is identical). */
  def synthPcm(df: DataFrame, idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val k = (id % 100 + 3).toInt
        val bb = java.nio.ByteBuffer.allocate(AudioN * 8)
        (0 until AudioN).foreach { t =>
          bb.putDouble(0.6 * math.sin(2 * math.Pi * k * t / AudioN) +
            0.25 * math.sin(2 * math.Pi * (2 * k) * t / AudioN))
        }
        (id, bb.array())
      }
    }.toDF("id", "wav")
  }

  /** Partition-batched spectral feature extraction: decode the byte
    * column back to samples, run an O(N²) DFT per clip (a real codec +
    * FFT would init once per partition — same shape), emit dominant
    * bin, low/high band energies, and the Parseval residual
    * |Σx² − (1/N)Σ|X|²| / Σx². Map-only over partitions; no shuffle. */
  def spectralFeatures(df: DataFrame, idCol: String,
      wavCol: String): Dataset[AudioFeatures] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(wavCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
          val n = bytes.length / 8
          val x = Array.fill(n)(bb.getDouble())
          val power = Array.tabulate(n) { kk =>
            var re = 0.0; var im = 0.0; var t = 0
            while (t < n) {
              val a = 2 * math.Pi * kk * t / n
              re += x(t) * math.cos(a); im -= x(t) * math.sin(a); t += 1
            }
            re * re + im * im
          }
          val timeE = x.map(v => v * v).sum
          val freqE = power.sum / n
          val dominant = (1 until n / 2).maxBy(power)
          val (lo, hi) = power.slice(1, n / 4).sum -> power.slice(n / 4, n / 2).sum
          AudioFeatures(id, n, dominant,
            math.rint(lo * 1e4) / 1e4, math.rint(hi * 1e4) / 1e4,
            math.abs(timeE - freqE) / timeE)
        }
      }
  }

  /** E5f ✱: synth → byte column → partition-batched DFT, gated by
    * physics: every clip's dominant bin equals the synthesized tone's
    * bin and the Parseval identity holds to 1e-9 — a wrong pack/unpack,
    * a broken DFT, or row mix-ups all fail in-plan. */
  private val e5Spectral: Q = (s, dir) => {
    val wav = synthPcm(t(s, dir, "embeddings"), "vec_id")
    spectralFeatures(wav, "id", "wav").toDF()
      .agg(
        expr("bool_and(dominant_bin = (id % 100 + 3))").as("tones_located"),
        expr("bool_and(parseval_err <= 1e-9)").as("parseval_holds"),
        expr("bool_and(n_samples = 256)").as("full_clips"),
        (count(lit(1)) > 0).as("nonempty"))
  }

  /** E5g: perceptual-hash image near-dup — the multimodal counterpart
    * of text MinHash dedup: decode → 64-bit aHash → banded LSH join
    * (4×16-bit bands, pigeonhole-exact for Hamming ≤ 3) → exact
    * Hamming refine. Planted near-identical images (one character of
    * every 10th doc's pixel window flipped — measured Hamming ≤ 2 at
    * both gate SFs) must ALL be recovered, and the candidate volume
    * stays under an ABSOLUTE 512·n budget (measured 29/img at sf0.01,
    * 316/img at sf0.1 — text-derived images cluster far more than
    * photographs; at corpus scale the band width grows ~log₂(n) bits
    * over a wider pHash, exactly as MinHash banding re-tunes). All
    * arithmetic downstream of the decoder is integer, so the gate is
    * deterministic. */
  private val e5PhashNearDup: Q = (s, dir) => {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val perturbed = when(length(col("text")) > 100,
      concat(substring(col("text"), 1, 99), lit("z"),
        expr("substring(text, 101)"))).otherwise(col("text"))
    val planted = docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          perturbed.as("text")))
    val hashes = ppmAHash(
      planted.withColumn("img", ppmImage), "doc_id", "img").toDF()
    val bands = hashes.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("key",
        expr("shiftrightunsigned(phash, band * 16) & 65535"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.phash").as("ha"), col("y.phash").as("hb"))
      .distinct()
    val pairs = cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= 3)
    val plantedPairs = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("a"), (col("doc_id") + 500000L).as("b"))
    pairs.agg(count(lit(1)).as("n_pairs"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hashes.agg(count(lit(1)).as("n_imgs")))
      .crossJoin(pairs.join(plantedPairs, Seq("a", "b"))
        .agg(count(lit(1)).as("n_rec")))
      .crossJoin(plantedPairs.agg(count(lit(1)).as("n_planted")))
      .select(
        (col("n_rec") === col("n_planted")).as("recall_ok"),
        (col("n_cand") <= lit(512L) * col("n_imgs")).as("pair_budget_ok"),
        (col("n_pairs") >= col("n_planted")).as("pairs_cover_planted"))
  }

  /** E5f: video frame sampling through the gate — each document's
    * bytes are a fixed-layout 12-frame × 32-byte "video", every 3rd
    * frame is sampled through the real mapPartitions slicer, and the
    * scene-cut signal is the |Δ mean| between consecutive sampled
    * frames (first frame: 0). DuckDB re-derives every sampled frame's
    * byte stats from the same construction, so a wrong slice offset, a
    * dropped frame, or a stride bug all hash-fail. Deltas compute from
    * UNROUNDED means on both engines (exact: 32 = 2^5). */
  private val e5FrameSample: Q = (s, dir) => {
    val frames = frameSample(
      t(s, dir, "documents").withColumn("vid",
        asciiOnly(coalesce(col("text"), lit(""))).cast("binary")),
      "doc_id", "vid", frameBytes = 32, nFrames = 12, stride = 3).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("cut_delta", round(abs(col("mean_b") -
        coalesce(lag(col("mean_b"), 1).over(w), col("mean_b"))), 4))
      .select(col("doc_id"), col("frame_idx"),
        round(col("mean_b"), 4).as("mean_b"), col("max_b"),
        col("cut_delta"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val queries: Map[String, Q] = Map(
    "e5_frame_sample" -> e5FrameSample,
    "e5_phash_neardup" -> e5PhashNearDup,
    "e5_spectral" -> e5Spectral,
    "e5_binary_meta" -> e5BinaryMeta,
    "e5_vector_join" -> e5VectorJoin,
    "e5_decode_batch" -> e5DecodeBatch,
    "e5_ppm_decode" -> e5PpmDecode,
    "e5_pipeline" -> e5Pipeline,
  )

  val oracles: Map[String, String] = Map(
    // Sampled-frame byte stats from the same fixed layout: frame f's
    // byte i is the document's (f·32 + i)-th byte or 0 padding; frames
    // 0,3,6,9 are the stride-3 sample. NULL text ⇒ strlen NULL ⇒ every
    // CASE falls to 0 — the all-zero video, matching coalesce('').
    "e5_frame_sample" ->
      """WITH a AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS t
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, fr::INT AS frame_idx,
        |    list_sum(list_transform(range(0, 32), i ->
        |      CASE WHEN fr*32 + i + 1 <= strlen(t)
        |           THEN ord(substr(t, (fr*32 + i + 1)::INT, 1))
        |           ELSE 0 END))::DOUBLE / 32.0 AS mean_raw,
        |    list_max(list_transform(range(0, 32), i ->
        |      CASE WHEN fr*32 + i + 1 <= strlen(t)
        |           THEN ord(substr(t, (fr*32 + i + 1)::INT, 1))
        |           ELSE 0 END))::INT AS max_b
        |  FROM a, unnest(range(0, 12, 3)) AS s(fr)),
        |d AS (
        |  SELECT doc_id, frame_idx, mean_raw, max_b,
        |    round(abs(mean_raw - coalesce(lag(mean_raw) OVER (
        |      PARTITION BY doc_id ORDER BY frame_idx), mean_raw)), 4)
        |      AS cut_delta
        |  FROM f)
        |SELECT doc_id, frame_idx, round(mean_raw, 4) AS mean_b, max_b,
        |  cut_delta
        |FROM d ORDER BY doc_id, frame_idx""".stripMargin,
    "e5_phash_neardup" ->
      """SELECT true AS recall_ok, true AS pair_budget_ok,
        |  true AS pairs_cover_planted""".stripMargin,
    "e5_spectral" ->
      """SELECT true AS tones_located, true AS parseval_holds,
        |  true AS full_clips, true AS nonempty""".stripMargin,
    // Every oracle below computes over the same ASCII-stripped
    // projection as the Spark side (see asciiOnly) — char ops equal
    // byte ops only once non-ASCII is gone.
    "e5_binary_meta" ->
      """WITH a AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS t
        |  FROM documents)
        |SELECT doc_id, strlen(t) AS n_bytes, md5(t) AS digest,
        | upper(hex(substr(t, 1, 8))) AS head8
        |FROM a ORDER BY doc_id""".stripMargin,
    "e5_vector_join" ->
      """SELECT label, lang, count(*) AS n,
        | round(avg(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4)
        |   AS avg_norm_sq
        |FROM embeddings JOIN documents ON vec_id = doc_id
        |GROUP BY label, lang ORDER BY label, lang""".stripMargin,
    "e5_decode_batch" ->
      """SELECT doc_id,
        | strlen(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Channel means recomputed from the same construction: pixel byte
    // i is the document's i-th byte (ASCII corpus: ord = byte) or 0
    // padding; R/G/B interleave as 3j/3j+1/3j+2. sum/64 is exact in
    // doubles (64 = 2^6), so round(…, 4) is stable on both engines.
    // Features recomputed from the same 192-byte construction: feature
    // r = mean of bytes r·24 … r·24+23. The byte sums are small
    // integers (exact in doubles), so the cosine arithmetic is
    // bit-identical across engines.
    "e5_pipeline" ->
      """WITH a AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS t
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 8), r ->
        |      list_sum(list_transform(range(1, 25), i ->
        |        CASE WHEN r*24 + i <= strlen(t)
        |             THEN ord(substr(t, (r*24 + i)::INT, 1))::DOUBLE
        |             ELSE 0.0 END)) / 24.0) AS v
        |  FROM a),
        |n AS (
        |  SELECT doc_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM f),
        |p AS (
        |  SELECT q.doc_id AS q_id, c.doc_id AS c_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM n q, n c WHERE q.doc_id < 5 AND c.doc_id <> q.doc_id),
        |rk AS (
        |  SELECT q_id, c_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY cos DESC, c_id) AS rnk
        |  FROM p)
        |SELECT q_id, rnk, c_id, round(cos, 6) AS sim
        |FROM rk WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,
    "e5_ppm_decode" ->
      """WITH a AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS t
        |  FROM documents),
        |px AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 192),
        |      i -> CASE WHEN i + 1 <= strlen(t)
        |             THEN ord(substr(t, (i + 1)::INT, 1)) ELSE 0 END) AS b
        |  FROM a)
        |SELECT doc_id, 8 AS width, 8 AS height,
        |  round(list_sum(list_transform(range(0, 64), j -> b[(3*j + 1)::INT]))
        |    / 64.0, 4) AS mean_r,
        |  round(list_sum(list_transform(range(0, 64), j -> b[(3*j + 2)::INT]))
        |    / 64.0, 4) AS mean_g,
        |  round(list_sum(list_transform(range(0, 64), j -> b[(3*j + 3)::INT]))
        |    / 64.0, 4) AS mean_b
        |FROM px ORDER BY doc_id""".stripMargin,
  )
}
