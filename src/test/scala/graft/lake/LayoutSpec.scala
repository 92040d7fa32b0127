package graft.lake

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def layoutOnce(): (String, org.apache.spark.sql.DataFrame) = {
    val out = Lake.scratchDir("t_zorder")
    val src = Layout.eventsWithX(spark, sf)
    Layout.zorderWrite(src, out, Layout.EventsSpec)
    (out, src)
  }

  test("z-scan answers exactly the raw box filter, via pruned directories") {
    val (out, src) = layoutOnce()
    val (xLo, xHi, yLo, yHi) = Layout.Box
    val scan = Layout.zScan(spark, out, Layout.EventsSpec, xLo, xHi, yLo, yHi)
    val expected = src.filter($"x_min".between(xLo, xHi) &&
      $"user_id".between(yLo, yHi))
      .select($"event_id").as[Long].collect().sorted.toSeq
    val got = scan.select($"event_id").as[Long].collect().sorted.toSeq
    assert(got == expected, "pruned scan must equal the raw box filter")

    // the pruning is real: PartitionFilters on zb in the plan, and the
    // bucket IN-list covers a strict subset of the written buckets
    val plan = physicalPlan(scan)
    assert(plan.contains("PartitionFilters") && plan.contains("zb"),
      s"zb pruning missing in:\n$plan")
    val total = spark.read.parquet(out).select($"zb").distinct().count()
    val scanned = Layout.bucketsForBox(Layout.EventsSpec, xLo, xHi, yLo, yHi)
    assert(scanned.size < total,
      s"box should touch a strict subset: ${scanned.size} of $total buckets")
  }

  test("bucket enumeration is a superset of the buckets holding box rows") {
    val (out, _) = layoutOnce()
    val (xLo, xHi, yLo, yHi) = Layout.Box
    val withBox = spark.read.parquet(out)
      .filter($"x_min".between(xLo, xHi) && $"user_id".between(yLo, yHi))
      .select($"zb".cast("long")).distinct().as[Long].collect().toSet
    val enumerated = Layout.bucketsForBox(
      Layout.EventsSpec, xLo, xHi, yLo, yHi).toSet
    assert(withBox.subsetOf(enumerated),
      s"rows in buckets ${withBox -- enumerated} would be lost")
  }

  test("files inside a bucket are z-sorted (row-group stats stay tight)") {
    val (out, _) = layoutOnce()
    val zv = Layout.zValue(Layout.EventsSpec)
    // per input-file z ranges must be non-overlapping when sorted —
    // verify within the most populated bucket
    val top = spark.read.parquet(out).groupBy($"zb").count()
      .orderBy($"count".desc).select($"zb".cast("long")).as[Long].head()
    val perFile = spark.read.parquet(out).filter($"zb" === top)
      .select(input_file_name().as("f"), zv.as("z"))
      .groupBy($"f").agg(min($"z").as("lo"), max($"z").as("hi"))
      .orderBy($"lo").as[(String, Long, Long)].collect()
    perFile.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, "file z-ranges overlap — sortWithinPartitions lost")
      case _ =>
    }
  }

  test("hidden day-transform scan equals the raw filter and prunes dirs") {
    val root = Lake.scratchDir("t_hidden_day")
    val day = Layout.DayTransform("ts")
    val src = Tables.load(spark, sf, "events")
    Layout.hiddenWrite(src, root, day)
    assert(Layout.hiddenSpec(root) == "day ts")
    val scan = Layout.hiddenScanRange(spark, root, day,
      "2024-01-05", "2024-01-09")
    val expected = src.filter(
      $"ts" >= lit("2024-01-05").cast("timestamp") &&
        $"ts" < lit("2024-01-09").cast("timestamp"))
      .select($"event_id").as[Long].collect().sorted.toSeq
    val got = scan.select($"event_id").as[Long].collect().sorted.toSeq
    assert(got == expected, "hidden scan must equal the raw ts filter")
    // pruning is real: a NON-EMPTY PartitionFilters entry naming _p —
    // FileSourceScanExec always prints "PartitionFilters: []", so mere
    // substring presence would pass with no pruning at all
    val plan = physicalPlan(scan)
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(pf.trim.nonEmpty && pf.contains("_p"),
      s"non-empty _p PartitionFilters missing in:\n$plan")
    val total = spark.read.parquet(root).select($"_p").distinct().count()
    assert(day.daysBetween("2024-01-05", "2024-01-09").size < total,
      "range should touch a strict subset of day directories")
  }

  test("hidden bucket-transform: expression and driver hash agree") {
    val buck = Layout.BucketTransform(8, "k")
    val keys = Seq(0L, 1L, 7L, 421L, 999999L, 2147483647L,
      -1L, -421L, Long.MinValue + 1)
    val got = keys.toDF("k").select(buck.partitionOf).as[Long].collect()
    assert(got.toSeq == keys.map(buck.bucketOf),
      "column hash and driver derivation must match")
  }

  test("hidden bucket scan returns exactly the key's rows") {
    val root = Lake.scratchDir("t_hidden_buck")
    val buck = Layout.BucketTransform(8, "o_custkey")
    val src = Tables.load(spark, sf, "orders")
    Layout.hiddenWrite(src, root, buck)
    val key = src.select($"o_custkey").as[Long].head()
    val got = Layout.hiddenScanKey(spark, root, buck, key)
      .select($"o_orderkey").as[Long].collect().sorted.toSeq
    val expected = src.filter($"o_custkey" === key)
      .select($"o_orderkey").as[Long].collect().sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }
}
