package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curate drops exact dups, near dups, and low-quality docs") {
    val good = "the quick brown fox jumps over the lazy dog tonight " +
      "again and again while everyone watches the show in the yard"
    val docs = Seq(
      (1L, good, "en"),
      (2L, good, "en"),                     // exact dup of 1 → dropped
      (3L, good + " okay", "en"),           // near dup of 1 → dropped
      (4L, "x y", "en"),                    // too short → quality 1/3 → dropped
      (5L, "completely different words about spark catalyst optimizer " +
        "plans here that still form a long enough document to pass the " +
        "length gate of the quality score", "de"),
    ).toDF("doc_id", "text", "lang")
    val byLang = Curation.curate(docs)
      .select($"lang", $"n_in", $"n_kept")
      .as[(String, Long, Option[Long])].collect()
      .map { case (l, nIn, nKept) => l -> ((nIn, nKept)) }.toMap
    assert(byLang("en") == ((4L, Some(1L))), s"got $byLang")
    assert(byLang("de") == ((1L, Some(1L))), s"got $byLang")
  }

  test("curate on the corpus keeps fewer docs than it receives") {
    val docs = Curation.withPlantedLang(Tables.load(spark, sf, "documents"))
    val out = Curation.curate(docs)
      .agg(sum($"n_in"), sum($"n_kept")).as[(Long, Long)].head()
    assert(out._1 == docs.count())
    assert(out._2 < out._1, s"expected removals, got $out")
    assert(out._2 > 0)
  }
}
