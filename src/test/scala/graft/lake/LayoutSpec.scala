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
}
