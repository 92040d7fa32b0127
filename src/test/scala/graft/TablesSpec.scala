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
}
