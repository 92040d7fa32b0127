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

  test("restore commits the old content as a NEW version, keeping history") {
    val root = Lake.scratchDir("t_restore")
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val v2 = Seq((1L, "CORRUPT"), (3L, "c")).toDF("k", "v")
    assert(Snapshots.commitVersion(v1, root) == 1)
    assert(Snapshots.commitVersion(v2, root) == 2)
    assert(Snapshots.restore(spark, root, toVersion = 1) == 3)
    assert(Snapshots.latestVersion(root) == 3)
    // latest now reads v1's content…
    assert(Snapshots.readVersion(spark, root)
      .orderBy($"k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // …and the bad version is still readable for audit.
    assert(Snapshots.readVersion(spark, root, Some(2))
      .orderBy($"k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "CORRUPT"), (3L, "c")))
  }

  test("tags are immutable refs that pin versions through vacuum") {
    val root = Lake.scratchDir("t_tags")
    assert(Snapshots.commitVersion(
      Seq((1L, "a")).toDF("k", "v"), root) == 1)
    // tagging an uncommitted version fails fast
    intercept[IllegalArgumentException](Snapshots.tag(root, "bad", 9))
    Snapshots.tag(root, "rel", 1)
    assert(Snapshots.tagVersion(root, "rel") == 1)
    // tags are write-once
    intercept[IllegalStateException](Snapshots.tag(root, "rel", 1))
    assert(Snapshots.commitVersion(Seq((2L, "b")).toDF("k", "v"), root) == 2)
    assert(Snapshots.commitVersion(Seq((3L, "c")).toDF("k", "v"), root) == 3)
    // retention would expire v1 and v2; the tag pins v1
    assert(Snapshots.vacuum(root, retain = 1) == Seq(2))
    assert(Snapshots.readTag(spark, root, "rel")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(Snapshots.latestVersion(root) == 3)
    // idempotent: a second vacuum expires nothing more
    assert(Snapshots.vacuum(root, retain = 1).isEmpty)
  }

  test("branches: create-once, isolated commits, no-op and refused " +
      "merges, heads pinned through vacuum") {
    val root = Lake.scratchDir("t_branches")
    assert(Snapshots.commitVersion(Seq((1L, "a")).toDF("k", "v"), root) == 1)
    // branching from an uncommitted version fails fast
    intercept[IllegalArgumentException](
      Snapshots.createBranch(root, "bad", 9))
    Snapshots.createBranch(root, "main", 1)
    // branch creation is write-once (the pointer moves only by
    // commit/merge)
    intercept[IllegalStateException](Snapshots.createBranch(root, "main", 1))
    Snapshots.createBranch(root, "dev", 1)
    assert(Snapshots.commitToBranch(
      Seq((2L, "b")).toDF("k", "v"), root, "dev") == 2)
    assert(Snapshots.branchHead(root, "main") == 1, "isolation broken")
    // merging a branch into itself-equal head is a no-op
    Snapshots.createBranch(root, "dev2", 1)
    assert(Snapshots.fastForwardMerge(root, "main", "dev2") == 1)
    // fast-forward applies, then diverged heads refuse
    assert(Snapshots.fastForwardMerge(root, "main", "dev") == 2)
    assert(Snapshots.commitToBranch(
      Seq((3L, "c")).toDF("k", "v"), root, "main") == 3)
    assert(Snapshots.commitToBranch(
      Seq((4L, "d")).toDF("k", "v"), root, "dev") == 4)
    intercept[IllegalArgumentException](
      Snapshots.fastForwardMerge(root, "main", "dev"))
    assert(Snapshots.parentChain(root, 4) == List(4, 2, 1))
    // vacuum retains BOTH live heads (3 and 4); v2 expires (dev2's
    // head v1 is also still a ref and survives)
    assert(Snapshots.vacuum(root, retain = 1) == Seq(2))
    assert(Snapshots.readBranch(spark, root, "main")
      .as[(Long, String)].collect().toSeq == Seq((3L, "c")))
    assert(Snapshots.readBranch(spark, root, "dev")
      .as[(Long, String)].collect().toSeq == Seq((4L, "d")))
    assert(Snapshots.readBranch(spark, root, "dev2")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("write-audit-publish: a failing audit never becomes readable") {
    val root = Lake.scratchDir("t_wap")
    val checks = Seq(Validate.Check("no_nulls",
      Validate.completeness("v"), _ === 1.0))
    def wap(df: org.apache.spark.sql.DataFrame) =
      Snapshots.commitAudited(spark, root)(p =>
        Lake.writeParquet(df, p))(Snapshots.validateAudit(checks))
    assert(wap(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) == Right(1))
    // poisoned batch: audit rejects, table still reads v1, staged data gone
    assert(wap(Seq((3L, null: String)).toDF("k", "v")) == Left("no_nulls"))
    assert(Snapshots.latestVersion(root) == 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "v=2")), "rejected data dir survived")
    assert(Snapshots.readVersion(spark, root)
      .orderBy($"k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // the rejected claim burns its number: the next publish is v3
    assert(wap(Seq((4L, "c")).toDF("k", "v")) == Right(3))
    assert(Snapshots.readVersion(spark, root)
      .as[(Long, String)].collect().toSeq == Seq((4L, "c")))
  }

  test("deletion vectors: merge-on-read equals the predicate complement") {
    val root = Lake.scratchDir("t_dv")
    val base = (1L to 30L).map(k => (k, k % 7)).toDF("k", "tag")
    assert(Snapshots.commitVersionWith(root)(p =>
      base.repartition(3).write.parquet(p)) == 1)
    Snapshots.deleteWhere(spark, root, 1, $"tag" === 0)
    def kept = Snapshots.readWithDeletes(spark, root, 1)
      .select($"k").as[Long].collect().toSet
    assert(kept == (1L to 30L).filter(_ % 7 != 0).toSet)
    // replaying the identical batch is a no-op
    Snapshots.deleteWhere(spark, root, 1, $"tag" === 0)
    assert(kept == (1L to 30L).filter(_ % 7 != 0).toSet)
    // an overlapping second batch composes as the union of deletes
    Snapshots.deleteWhere(spark, root, 1, $"k" % 2 === 0)
    assert(kept == (1L to 30L).filter(k => k % 7 != 0 && k % 2 != 0).toSet)
    // the base version itself was never rewritten
    assert(Snapshots.readVersion(spark, root, Some(1)).count() == 30)
  }

  test("tag names that collide with protocol suffixes or escape the " +
      "root are rejected") {
    val root = Lake.scratchDir("t_tag_names")
    assert(Snapshots.commitVersion(Seq((1L, "a")).toDF("k", "v"), root) == 1)
    // vacuum's tag scan excludes *.tmp/*.claim — such names would be
    // silently unpinned; '/'-bearing names escape the root dir.
    intercept[IllegalArgumentException](Snapshots.tag(root, "rel.tmp", 1))
    intercept[IllegalArgumentException](Snapshots.tag(root, "rel.claim", 1))
    intercept[IllegalArgumentException](Snapshots.tag(root, "../esc", 1))
    intercept[IllegalArgumentException](Snapshots.tag(root, "a/b", 1))
    intercept[IllegalArgumentException](Snapshots.tag(root, "", 1))
    Snapshots.tag(root, "rel-1.0_final", 1) // legal charset still works
    assert(Snapshots.tagVersion(root, "rel-1.0_final") == 1)
  }

  test("deleteWhere counts distinct positions; restore applies deletion " +
      "vectors and compacts the sidecar away") {
    val root = Lake.scratchDir("t_dv_restore")
    val base = (1L to 20L).map(k => (k, k % 5)).toDF("k", "tag")
    assert(Snapshots.commitVersionWith(root)(p =>
      base.repartition(2).write.parquet(p)) == 1)
    assert(Snapshots.deleteWhere(spark, root, 1, $"tag" === 0) == 4)
    // replayed batch: appended duplicates must NOT inflate the count
    assert(Snapshots.deleteWhere(spark, root, 1, $"tag" === 0) == 4)
    assert(Snapshots.deleteWhere(spark, root, 1, $"k" === 1L) == 5)
    // restore(v1) must commit the LOGICAL rows (deletes applied) —
    // a DV-blind restore would resurrect k ∈ {1,5,10,15,20}.
    assert(Snapshots.restore(spark, root, toVersion = 1) == 2)
    assert(Snapshots.readVersion(spark, root, Some(2))
      .select($"k").as[Long].collect().toSet ==
      (1L to 20L).filter(k => k % 5 != 0 && k != 1L).toSet)
    // the restored version is sidecar-free (restore = DV compaction)
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(root, "_dv_v2")))
  }

  test("vacuum sweeps the _dv sidecar alongside its expired version") {
    val root = Lake.scratchDir("t_dv_vacuum")
    val base = (1L to 10L).toDF("k")
    assert(Snapshots.commitVersion(base, root) == 1)
    Snapshots.deleteWhere(spark, root, 1, $"k" === 3L)
    assert(Snapshots.commitVersion(base.filter($"k" =!= 3L), root) == 2)
    assert(Snapshots.vacuum(root, retain = 1) == Seq(1))
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(root, "_dv_v1")),
      "expired version's deletion-vector sidecar was orphaned")
  }

  test("readVersionUnified composes multi-hop rename chains, types " +
      "missing columns, and keeps working after the renaming version " +
      "itself expires") {
    val root = Lake.scratchDir("t_evolve")
    assert(Snapshots.commitVersion(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "a"), root) == 1)
    // v2 renames a→b and adds s; v3 renames b→c. Unified = (k, c, s).
    assert(Snapshots.commitEvolvedWith(root, Map("b" -> "a"))(p =>
      Lake.writeParquet(Seq((1L, 11.0, "x")).toDF("k", "b", "s"), p)) == 2)
    assert(Snapshots.commitEvolvedWith(root, Map("c" -> "b"))(p =>
      Lake.writeParquet(Seq((1L, 12.0, "y")).toDF("k", "c", "s"), p)) == 3)
    def u1 = Snapshots.readVersionUnified(spark, root, 1)
    assert(u1.columns.toSeq == Seq("k", "c", "s"))
    assert(u1.orderBy($"k").as[(Long, Double, String)].collect().toSeq ==
      Seq((1L, 10.0, null), (2L, 20.0, null)),
      "v1's c must resolve a←b←c through two hops; s must be typed NULL")
    // Pin v1 and expire v2: the rename metadata v2 introduced must
    // survive its data's expiry or the pinned v1 becomes unreadable
    // under the unified schema.
    Snapshots.tag(root, "pin", 1)
    assert(Snapshots.vacuum(root, retain = 1) == Seq(2))
    assert(u1.orderBy($"k").as[(Long, Double, String)].collect().toSeq ==
      Seq((1L, 10.0, null), (2L, 20.0, null)),
      "rename chain broken by expiring the version that introduced it")
  }

  test("readVersionUnified widens types across versions (int v1 column " +
      "read under a long unified schema)") {
    val root = Lake.scratchDir("t_widen")
    assert(Snapshots.commitVersion(
      Seq((1, 5)).toDF("k", "n"), root) == 1) // both INT at v1
    assert(Snapshots.commitVersion(
      Seq((2L, 6L)).toDF("k", "n"), root) == 2) // widened to LONG at v2
    val u1 = Snapshots.readVersionUnified(spark, root, 1)
    assert(u1.schema.map(_.dataType.simpleString) == Seq("bigint", "bigint"),
      "v1's int columns must read as the unified bigint")
    assert(u1.as[(Long, Long)].collect().toSeq == Seq((1L, 5L)))
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

  test("shallow clone pins the source version and isolates divergence") {
    import java.nio.file.{Files, Paths}
    val src = Lake.scratchDir("clonesrc")
    val cl = Lake.scratchDir("clonecl")
    Snapshots.writeVersion(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src, 1)
    val pin = Snapshots.cloneTable(src, cl)
    assert(pin == 1)
    // zero-copy: no data directory materialized under the clone
    assert(!Files.isDirectory(Paths.get(cl, "v=1")))
    assert(Snapshots.readCloneVersion(spark, cl).orderBy($"id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
    // clone diverges locally; the source head must not move
    Snapshots.writeVersion(Seq((9L, "z")).toDF("id", "v"), cl, 2)
    assert(Snapshots.latestVersion(src) == 1)
    assert(Snapshots.readCloneVersion(spark, cl)
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    // the source moves on; the clone's pinned read is unaffected
    Snapshots.writeVersion(Seq((7L, "y")).toDF("id", "v"), src, 2)
    assert(Snapshots.readCloneVersion(spark, cl, Some(1)).orderBy($"id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
    assert(Snapshots.latestVersion(cl) == 2)
    // error paths: above-pin hole, and a non-clone table
    intercept[IllegalArgumentException](
      Snapshots.readCloneVersion(spark, cl, Some(5)))
    intercept[IllegalArgumentException](
      Snapshots.readCloneVersion(spark, src, Some(9)))
  }

  test("AS OF timestamp: newest-≤ resolution, inclusive boundary, " +
      "error below first, non-monotonic append refused") {
    val root = Lake.scratchDir("t_asof")
    val df = Seq(1L, 2L, 3L).toDF("x")
    assert(Snapshots.commitVersionAt(df.filter($"x" === 1), root, 100L) == 1)
    assert(Snapshots.commitVersionAt(df.filter($"x" <= 2), root, 200L) == 2)
    assert(Snapshots.versionAsOf(root, 150L) == 1) // between → older
    assert(Snapshots.versionAsOf(root, 200L) == 2) // exactly at → incl.
    assert(Snapshots.versionAsOf(root, 9999L) == 2) // after all → head
    intercept[IllegalArgumentException](Snapshots.versionAsOf(root, 99L))
    // timestamps must strictly increase (Delta silently adjusts; we
    // refuse) — and the refusal happens BEFORE any version is claimed
    intercept[IllegalArgumentException](
      Snapshots.commitVersionAt(df, root, 200L))
    assert(Snapshots.latestVersion(root) == 2)
    assert(Snapshots.readAsOf(spark, root, 500L)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
