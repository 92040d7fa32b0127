package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Regression for the events.ts encoding drift (round-6 verdict item 1):
  * the testdata has shipped `events.ts` both as INT64 TIMESTAMP(NANOS)
  * (reads as LongType under nanosAsLong=true) and as plain timestamp[us]
  * (reads as TIMESTAMP_NTZ). `Tables.load` must normalize BOTH to one
  * TimestampType column with identical instants.
  */
class TablesSpec extends SparkSpec {

  test("Tables.load normalizes events.ts under both parquet encodings") {
    // the shipped encoding, whatever it currently is
    val shipped = Tables.load(spark, sf, "events")
    assert(shipped.schema("ts").dataType == TimestampType,
      s"shipped encoding → ${shipped.schema("ts").dataType}")

    // re-encode the same rows as INT64 nanos (what nanosAsLong=true
    // yields for the old TIMESTAMP(NANOS) files: a plain LongType read)
    val dir = lake.Lake.scratchDir("events_nanos_enc")
    shipped.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val asLong = spark.read.parquet(s"$dir/events.parquet")
    assert(asLong.schema("ts").dataType == LongType)

    val rebuilt = Tables.load(spark, dir, "events")
    assert(rebuilt.schema("ts").dataType == TimestampType)

    val a = shipped.select("event_id", "ts").orderBy("event_id")
      .collect().map(_.toSeq).toSeq
    val b = rebuilt.select("event_id", "ts").orderBy("event_id")
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty, s"instants diverge: ${a.size} vs ${b.size}")
  }

  test("every testdata table honors its column contract at every SF") {
    // The driver regenerates /root/testdata each round and has changed
    // encodings under us before (the round-6 events.ts break). This
    // smoke-checks ONLY parquet footers (no data read) for the columns
    // the query suite keys on, at all three scale factors — so any
    // schema/type drift fails one obvious test instead of 30 obscure
    // queries.
    import org.apache.spark.sql.types._
    val contract: Map[String, Seq[String]] = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_size"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate"),
      "lineitem" -> Seq("l_orderkey", "l_linenumber", "l_partkey",
        "l_suppkey", "l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag"),
      "events" -> Seq("event_id", "user_id", "ts", "event_type", "value"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"); (tbl, cols) <- contract) {
      val schema = Tables.load(spark, sfDir, tbl).schema
      val missing = cols.filterNot(schema.fieldNames.contains)
      assert(missing.isEmpty, s"$sfDir/$tbl missing: $missing")
      if (tbl == "events")
        assert(schema("ts").dataType == TimestampType,
          s"$sfDir events.ts: ${schema("ts").dataType}")
      if (tbl == "embeddings")
        assert(schema("embedding").dataType ==
          ArrayType(FloatType, containsNull = true) ||
          schema("embedding").dataType ==
          ArrayType(FloatType, containsNull = false),
          s"$sfDir embedding: ${schema("embedding").dataType}")
    }
  }
}
