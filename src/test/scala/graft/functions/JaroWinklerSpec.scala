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
}
