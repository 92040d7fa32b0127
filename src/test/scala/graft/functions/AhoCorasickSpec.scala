package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import graft.SparkSpec

/** Pins [[AhoCorasickScan]]'s substring-semantics contract: every
  * dictionary term t with position(t IN text) > 0 is reported exactly
  * once, lexicographically sorted — including terms that end inside a
  * longer match (the failure-link path a trie-only matcher misses) —
  * and dictionary size must not change the answer. */
class AhoCorasickSpec extends SparkSpec {

  private def scan(terms: Seq[String], text: String): Seq[String] = {
    val arr = AcAutomaton.build(terms.toArray)
      .scan(UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  private def ref(terms: Seq[String], text: String): Seq[String] =
    terms.distinct.filter(text.contains(_)).sorted

  test("classic he/she/hers overlap: all suffix matches reported") {
    assert(scan(Seq("he", "she", "hers"), "ushers") ==
      Seq("he", "hers", "she"))
  }

  test("suffix inside a longer word found via failure links") {
    assert(scan(Seq("park", "spark"), "a sparkling demo") ==
      Seq("park", "spark"))
  }

  test("empty text, no-match text, repeat hits deduped, sorted output") {
    val terms = Seq("ab", "b", "ba")
    assert(scan(terms, "") == Nil)
    assert(scan(terms, "xyz") == Nil)
    assert(scan(terms, "abab") == Seq("ab", "b", "ba"))
  }

  test("property: equals contains-filter reference; decoy-padded " +
    "dictionary answers identically") {
    val termGen = Gen.listOfN(6, Gen.oneOf("a", "b", "c", " "))
      .map(_.mkString).suchThat(_.nonEmpty)
    val textGen = Gen.listOfN(40, Gen.oneOf("a", "b", "c", " "))
      .map(_.mkString)
    val cases = Gen.listOfN(200,
        Gen.zip(Gen.nonEmptyListOf(termGen), textGen))
      .sample.getOrElse(Nil)
    val decoys = (0 until 500).map(i => s"#decoy$i")
    for ((terms, text) <- cases) {
      val expect = ref(terms, text)
      assert(scan(terms, text) == expect, s"terms=$terms text='$text'")
      assert(scan(terms ++ decoys, text) == expect,
        s"decoy-padded terms=$terms text='$text'")
    }
  }

  test("column API matches per-row contains under codegen") {
    import spark.implicits._
    val terms = Seq("agg row", "scan", "park", "spark", "a a") ++
      (0 until 50).map(i => s"#d$i")
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .limit(50)
      .select(col("doc_id"), col("text"),
        AhoCorasickScan.dictScan(col("text"), terms).as("hits"))
    val rows = df.as[(Long, String, Seq[String])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, text, hits) =>
      assert(hits == ref(terms, text), s"doc $id")
    }
  }

  test("build rejects empty dictionaries and empty terms") {
    intercept[IllegalArgumentException](AcAutomaton.build(Array.empty))
    intercept[IllegalArgumentException](AcAutomaton.build(Array("a", "")))
  }
}
