package graft.lake

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("time travel: versions are immutable, manifest tracks latest") {
    val root = Lake.scratchDir("t_snap")
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val v2 = Seq((1L, "a2"), (3L, "c")).toDF("k", "v")
    Snapshots.writeVersion(v1, root, 1)
    assert(Snapshots.latestVersion(root) == 1)
    Snapshots.writeVersion(v2, root, 2)
    assert(Snapshots.latestVersion(root) == 2)
    // latest resolves v2; explicit v1 still reads the old rows
    assert(Snapshots.readVersion(spark, root)
      .orderBy($"k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a2"), (3L, "c")))
    assert(Snapshots.readVersion(spark, root, Some(1))
      .orderBy($"k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("funnel stages require strictly-later events") {
    // user 1: proper view < click < purchase → all stages
    // user 2: purchase BEFORE click → stages 1-2 only
    // user 3: view only → stage 1 only
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "view", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
      (3L, "view", 10L))
      .toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds($"sec"))
      .withColumn("event_id", $"user_id" * 100 + $"sec")
    ev.createOrReplaceTempView("t_funnel_events")
    // drive the same logic as ev5 via a scratch dir-free projection
    def first(tpe: String) = ev.filter($"event_type" === tpe)
      .groupBy($"user_id").agg(min($"ts").as(s"t_$tpe"))
    val s2 = first("view").join(ev.filter($"event_type" === "click"), Seq("user_id"))
      .filter($"ts" > $"t_view").groupBy($"user_id", $"t_view")
      .agg(min($"ts").as("t_click"))
    val s3 = s2.join(ev.filter($"event_type" === "purchase"), Seq("user_id"))
      .filter($"ts" > $"t_click").groupBy($"user_id")
      .agg(min($"ts").as("t_purchase"))
    assert(first("view").count() == 3)
    assert(s2.select($"user_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(s3.select($"user_id").as[Long].collect().toSeq == Seq(1L),
      "user 2's pre-click purchase must not advance the funnel")
  }
}
