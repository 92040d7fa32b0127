package graft.lake

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** Property-style checks for choice resolution (P2) and split/explode
  * (F2) — each property evaluated over one generated batch in a single
  * DataFrame pass (per-sample Spark jobs would be pathologically slow).
  */
class ChoiceProperties extends SparkSpec {
  import spark.implicits._

  test("property: try_cast int — numeric strings parse, junk nulls, round-trip") {
    val numeric = Gen.chooseNum(Int.MinValue, Int.MaxValue).map(_.toString)
    val junk = Gen.oneOf(Gen.alphaStr.suchThat(_.nonEmpty),
      Gen.const("12.5x"), Gen.const(""), Gen.const("N/A"), Gen.const("\\N"))
    val samples = Gen.listOfN(150, Gen.oneOf(numeric, junk))
      .sample.getOrElse(Nil)
    val df = samples.toDF("s")
    val got = Lake.resolveChoice(df.withColumn("c", col("s")), "c", "int")
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    got.foreach { case (s, parsed) =>
      val expected = s.toIntOption
      assert(parsed == expected, s"try_cast('$s') = $parsed, want $expected")
    }
  }

  test("property: make_struct claims each value in exactly one field") {
    val numeric = Gen.chooseNum(Int.MinValue, Int.MaxValue).map(_.toString)
    val junk = Gen.oneOf(Gen.alphaStr.suchThat(_.nonEmpty),
      Gen.const("12.5x"), Gen.const("N/A"))
    val samples = Gen.listOfN(150, Gen.oneOf(numeric, junk))
      .sample.getOrElse(Nil)
    val got = Lake.resolveChoiceStruct(
      samples.toDF("s").withColumn("c", col("s")), "c", Seq("int", "string"))
      .select(col("s"), col("c.as_int"), col("c.as_string"))
      .collect()
    got.foreach { r =>
      val s = r.getString(0)
      val asInt = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val asStr = Option(r.getString(2))
      s.toIntOption match {
        case Some(i) => // int claims it; string field must stay null
          assert(asInt.contains(i) && asStr.isEmpty, s"'$s' -> ($asInt, $asStr)")
        case None =>
          assert(asInt.isEmpty && asStr.contains(s), s"'$s' -> ($asInt, $asStr)")
      }
    }
  }

  test("property: make_cols equals make_struct flattened") {
    val samples = Gen.listOfN(120, Gen.oneOf(
      Gen.chooseNum(-9999, 9999).map(_.toString),
      Gen.alphaStr.suchThat(_.nonEmpty))).sample.getOrElse(Nil)
    val viaCols = Lake.resolveChoiceCols(
      samples.toDF("s").withColumn("c", col("s")), "c", Seq("int", "string"))
      .select(col("s"), col("c_int"), col("c_string"))
      .collect().map(_.toSeq).toSeq
    val viaStruct = Lake.resolveChoiceStruct(
      samples.toDF("s").withColumn("c", col("s")), "c", Seq("int", "string"))
      .select(col("s"), col("c.as_int"), col("c.as_string"))
      .collect().map(_.toSeq).toSeq
    assert(viaCols == viaStruct)
    // and the choice column itself is gone after make_cols
    val cols = Lake.resolveChoiceCols(
      samples.toDF("s").withColumn("c", col("s")), "c", Seq("int", "string"))
      .columns.toSeq
    assert(cols == Seq("s", "c_int", "c_string"))
  }

  test("property: split is inverted by concat_ws for delimiter-free words") {
    val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val sentences = Gen.listOfN(80, Gen.nonEmptyListOf(word).map(_.mkString(" ")))
      .sample.getOrElse(Nil)
    val df = sentences.toDF("text")
      .withColumn("rt", concat_ws(" ", split(col("text"), " ")))
    assert(df.filter(col("rt") =!= col("text")).count() == 0)
  }

  test("property: rank-based percentiles equal the builtin on random groups") {
    // random group sizes incl. the 1- and 2-element edge cases, random
    // values incl. exact ties — one DataFrame pass for all groups
    val gen = for {
      nGroups <- Gen.chooseNum(1, 8)
      rows <- Gen.listOfN(400, for {
        g <- Gen.chooseNum(0, nGroups - 1)
        v <- Gen.frequency(
          (8, Gen.chooseNum(-1000, 1000).map(i => Option(i / 10.0))),
          (1, Gen.const(Option(42.0))), // planted ties
          (1, Gen.const(Option.empty[Double]))) // scattered nulls
      } yield (s"g$g", v))
      single <- Gen.chooseNum(0, 1000) // a singleton group
    } yield rows ++ List(("solo", Option(single / 10.0)),
      ("allnull", Option.empty[Double])) // an all-null group
    val data = gen.sample.getOrElse(List(("g0", Option(1.0))))
    val df = data.toDF("g", "v")
    val viaRank = graft.operators.Relational
      .exactPercentiles(df, "g", "v",
        Seq("p10" -> 0.1, "p50" -> 0.5, "p99" -> 0.99))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val viaBuiltin = df.groupBy(col("g"))
      .agg(round(expr("percentile(v, 0.1)"), 4).as("p10"),
        round(expr("percentile(v, 0.5)"), 4).as("p50"),
        round(expr("percentile(v, 0.99)"), 4).as("p99"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(viaRank == viaBuiltin)
  }

  test("property: explode fanout count equals total word count") {
    val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val docs = Gen.listOfN(40, Gen.nonEmptyListOf(word).map(_.mkString(" ")))
      .sample.getOrElse(Nil)
    val expected = docs.map(_.split(" ").length.toLong).sum
    val n = docs.toDF("text")
      .select(explode(split(col("text"), " ")))
      .count()
    assert(n == expected)
  }
}
