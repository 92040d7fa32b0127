package graft.lake

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end replica of the reference's whole demo path: IMDB-shaped
  * TSVs → ETL job (dual parquet, birthYear-partitioned) → catalog
  * registration → the demo's ratings⋈basics join query. */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixtures(): (String, String, String) = {
    val root = Lake.scratchDir("etl_fix")
    val names = Seq(
      ("nm1", "Fred Astaire", "1899", "1987", "actor,soundtrack", "tt0050419,tt0072308"),
      ("nm2", "Lauren Bacall", "1924", "2014", "actress,soundtrack", "tt0117057,tt0038355"),
      ("nm3", "Unknown Person", "\\N", "\\N", "\\N", "tt0050419"))
      .toDF("nconst", "primaryName", "birthYear", "deathYear",
        "primaryProfession", "knownForTitles")
    // Write the raw zone the way the downloads land: plain TSV, \N nulls.
    names.write.option("sep", "\t").option("header", "true")
      .option("emptyValue", "").csv(s"$root/name.basics")
    Seq(("tt0050419", "Funny Face"), ("tt0072308", "The Towering Inferno"),
      ("tt0117057", "The Mirror Has Two Faces"))
      .toDF("tconst", "primarytitle")
      .write.option("sep", "\t").option("header", "true")
      .csv(s"$root/title.basics")
    Seq(("tt0050419", 7.0), ("tt0117057", 6.6))
      .toDF("tconst", "averagerating")
      .write.option("sep", "\t").option("header", "true")
      .csv(s"$root/title.ratings")
    (s"$root/name.basics", s"$root/title.basics", s"$root/title.ratings")
  }

  test("name.basics ETL: choice nulls, dual writes, birthYear partition layout") {
    val (namesDir, _, _) = writeFixtures()
    val outPart = Lake.scratchDir("etl_part")
    val outFlat = Lake.scratchDir("etl_flat")
    Etl.tsvToParquet(spark, namesDir, Etl.nameBasicsMapping,
      outPart, outFlat, Seq("birthYear"))

    val dirs = new java.io.File(outPart).listFiles().map(_.getName).toSet
    assert(dirs.contains("birthYear=1899"), s"partition dirs: $dirs")
    assert(dirs.contains("birthYear=__HIVE_DEFAULT_PARTITION__"),
      "\\N birthYear must land in the null partition")

    val back = spark.read.parquet(outFlat).orderBy("nconst").collect()
    assert(back.length == 3)
    assert(back(0).getAs[Int]("birthYear") == 1899)
    assert(back(2).isNullAt(back(2).fieldIndex("birthYear")),
      "choice column resolves \\N to null int")

    val pruned = spark.read.parquet(outPart)
      .filter($"birthYear" === 1924)
    assert(pruned.count() == 1)
    assert(physicalPlan(pruned).contains("PartitionFilters"))
  }

  test("the demo join query runs over the registered ETL output") {
    val (namesDir, basicsDir, ratingsDir) = writeFixtures()
    val outPart = Lake.scratchDir("etl_p2")
    val outFlat = Lake.scratchDir("etl_f2")
    val names = Etl.tsvToParquet(spark, namesDir, Etl.nameBasicsMapping,
      outPart, outFlat, Seq("birthYear"))
    Lake.register(spark, Map(
      "name.basics" -> names,
      "title.basics" -> Lake.readTsv(spark, basicsDir),
      "title.ratings" -> Lake.readTsv(spark, ratingsDir)),
      prefix = "with_classifier_")
    // The reference's named join query (stacks/demo_stack.py:288).
    val joined = spark.sql(
      """SELECT b.primarytitle, r.averagerating
        |FROM with_classifier_title_ratings r
        |JOIN with_classifier_title_basics b ON r.tconst = b.tconst
        |ORDER BY b.primarytitle""".stripMargin).collect()
    assert(joined.map(_.getString(0)).toSeq ==
      Seq("Funny Face", "The Mirror Has Two Faces"))
    // Comma-list columns split/explode (the reference's nested idiom).
    val fanout = names
      .select(explode(split($"knownForTitles", ",")).as("tconst"))
      .count()
    assert(fanout == 5)
  }

  test("scd2 collapses runs into validity intervals with one open row per key") {
    // key 1: A,A,B,A — the repeated A at t2 merges into run 1; the A at
    // t4 is a NEW run (version 3). key 2: a single run stays current.
    val feed = Seq(
      (1L, "A", 1, 10L), (1L, "A", 2, 11L), (1L, "B", 3, 12L),
      (1L, "A", 4, 13L), (2L, "X", 1, 20L))
      .toDF("k", "attr", "ts", "id")
    val got = Etl.scd2(feed, "k", "attr", "ts", "id")
      .orderBy($"k", $"version")
      .select($"k", $"version", $"attr_value", $"effective_from",
        $"effective_to", $"is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3), if (r.isNullAt(4)) -1 else r.getInt(4), r.getLong(5)))
      .toSeq
    assert(got == Seq(
      (1L, 1L, "A", 1, 3, 0L),
      (1L, 2L, "B", 3, 4, 0L),
      (1L, 3L, "A", 4, -1, 1L),
      (2L, 1L, "X", 1, -1, 1L)), s"got $got")
  }
}
