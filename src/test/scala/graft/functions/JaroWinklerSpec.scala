package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Jaro-Winkler variant to DuckDB's semantics: the fixture
  * values below are DuckDB 1.0 `jaro_winkler_similarity` outputs
  * (probed directly), covering the classic textbook pairs, the 0.7
  * boost threshold, byte-level (not codepoint) scoring, and empty
  * strings. The oracle gate (`e12_jaro_er`) then proves bit-for-bit
  * agreement across every within-brand part-name pair. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    // (a, b, duckdb jaro_winkler_similarity)
    ("MARTHA", "MARHTA", 0.9611111111111111),   // transpositions + boost
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("ABCDEF", "ABZZZZ", 0.5555555555555555),   // jaro ≤ 0.7 ⇒ NO boost
    ("CRATE", "TRACE", 0.7333333333333334),     // boost-eligible, prefix 0
    ("naïve", "naive", 0.8577777777777779),     // BYTE-level: lengths 6/5
    ("", "a", 0.0),
    ("", "", 0.0),                              // DuckDB: empty ⇒ 0, not 1
    ("a", "a", 1.0),
    ("ab", "ba", 0.0))                          // window 0: no matches

  test("compute matches DuckDB's jaro_winkler_similarity on fixtures") {
    for ((a, b, want) <- fixtures) {
      val got = JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"jw($a, $b): got $got want $want")
      val sym = JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(sym == got, s"jw not symmetric on ($a, $b)")
    }
  }

  test("SQL registration and codegen/interpreted paths agree") {
    val df = fixtures.toDF("a", "b", "want")
    val viaSql = df.selectExpr("jaro_winkler(a, b) AS jw", "want")
      .as[(Double, Double)].collect()
    viaSql.foreach { case (jw, want) => assert(jw == want) }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(
        JaroWinkler.jaroWinkler($"a", $"b").as("jw"), $"want")
        .as[(Double, Double)].collect()
      interp.foreach { case (jw, want) => assert(jw == want) }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null inputs yield null, not 0") {
    val df = Seq((Some("x"), None: Option[String]), (None, Some("y")))
      .toDF("a", "b")
    val out = df.select(JaroWinkler.jaroWinkler($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("jaroWinklerPairs char-bag prefilter loses no pair vs brute force") {
    // Adversarial rows for the exact char-bag bound: uppercase (all
    // out-of-alphabet → nz bucket), transposed FIRST letters (kills any
    // prefix-equality blocking — JW is still high), length mismatches,
    // empty strings, near-identical lowercase names.
    val rows = Seq(
      (1L, "blk", "MARTHA"), (2L, "blk", "MARHTA"),   // uppercase, high JW
      (3L, "blk", "amrtha"), (4L, "blk", "martha"),   // first-letter swap
      (5L, "blk", "forest green metallic"), (6L, "blk", "forest green metalic"),
      (7L, "blk", ""), (8L, "blk", ""),               // DuckDB: jw("","")=0
      (9L, "blk", "x"), (10L, "blk", "xyzzy plugh"),  // length ratio < 0.4
      (11L, "blk", "DWAYNE"), (12L, "blk", "DUANE"),
      (13L, "blk", "naïve"), (14L, "blk", "naive"),   // multi-byte
      (15L, "blk", "martha"), (16L, "blk", "martha"), // identical → jw 1.0
      (17L, "other", "martha"))                       // no cross-block pair
    val df = rows.toDF("id", "blk", "s")
    for (thr <- Seq(0.7, 0.8, 0.88, 0.95)) {
      val fast = graft.ext.Dedup.jaroWinklerPairs(df, "id", "s", "blk", thr)
        .orderBy("key_a", "key_b").collect().map(_.toSeq).toSeq
      val brute = df.as("a").join(df.as("b"),
          $"a.blk" === $"b.blk" && $"a.id" < $"b.id")
        .select($"a.id".as("key_a"), $"b.id".as("key_b"),
          JaroWinkler.jaroWinkler($"a.s", $"b.s").as("jw"))
        .filter($"jw" >= thr)
        .select($"key_a", $"key_b", round($"jw", 6).as("jw"))
        .orderBy("key_a", "key_b").collect().map(_.toSeq).toSeq
      assert(fast == brute,
        s"thr=$thr: prefilter changed the result\nfast=$fast\nbrute=$brute")
    }
  }

  test("jaroWinklerPairs enumerates far fewer pairs than Σ|block|² on skew") {
    // Skewed fixture: ONE hot block holding 2000 rows drawn from a
    // 200-name domain (10× duplication — the entity-resolution shape:
    // most rows repeat a spelling). Two sub-quadratic levers must both
    // show up:
    //  1. value-domain scoring: scored pairs ≤ C(|domain|, 2), never
    //     C(|block|, 2) — 100× fewer here;
    //  2. prefix filtering: candidate DISTINCT-name pairs stay strictly
    //     under the distinct-pair budget too (length filter + rarest-
    //     token blocking bite on varied-length names).
    // Deterministic name generator: varied lengths 6..24, letters keyed
    // off (i % 200) so the domain is exactly 200 spellings.
    val names = (0 until 200).map { i =>
      val len = 6 + (i * 7) % 19
      val sb = new StringBuilder
      var x = i * 2654435761L
      (0 until len).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + ((x >>> 33) % 26).toInt).toChar
      }
      sb.toString
    }
    val rows = (0 until 2000).map(r => (r.toLong, "hot", names(r % 200)))
    val df = rows.toDF("id", "blk", "s")
    val thr = 0.92
    val nameDomain = df.select($"blk", $"s").distinct()
    val candidates =
      graft.ext.Dedup.jaroWinklerCandidates(nameDomain, thr).count()
    val rowPairs = 2000L * 1999 / 2
    val domainPairs = 200L * 199 / 2
    assert(candidates < rowPairs / 50,
      s"candidate names pairs $candidates should be ≪ row pairs $rowPairs")
    assert(candidates < domainPairs / 2,
      s"prefix+length filtering should beat the distinct-pair budget " +
        s"$domainPairs, got $candidates")
    // Completeness on the same skewed fixture: exact equality with the
    // all-pairs answer.
    val fast = graft.ext.Dedup.jaroWinklerPairs(df, "id", "s", "blk", thr)
      .orderBy("key_a", "key_b").collect().map(_.toSeq).toSeq
    val brute = df.as("a").join(df.as("b"),
        $"a.blk" === $"b.blk" && $"a.id" < $"b.id")
      .select($"a.id".as("key_a"), $"b.id".as("key_b"),
        JaroWinkler.jaroWinkler($"a.s", $"b.s").as("jw"))
      .filter($"jw" >= thr)
      .select($"key_a", $"key_b", round($"jw", 6).as("jw"))
      .orderBy("key_a", "key_b").collect().map(_.toSeq).toSeq
    assert(fast == brute, s"skewed fixture mismatch: fast=${fast.size} " +
      s"brute=${brute.size}")
  }
}
