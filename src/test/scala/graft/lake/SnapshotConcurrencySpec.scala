package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.util.concurrent.{ConcurrentHashMap, CyclicBarrier}
import scala.jdk.CollectionConverters._

/** Optimistic-concurrency contract for the snapshot commit log
  * (round-8 verdict item 5): two writers racing the same table must
  * yield one winner per version, lose no snapshot, and keep
  * time-travel reads consistent — the Delta/Iceberg concurrent-commit
  * behavior the mutable `_latest` pointer could not give.
  */
class SnapshotConcurrencySpec extends SparkSpec {

  test("the claim CAS admits exactly one winner per version") {
    val root = Lake.scratchDir("snap_cas")
    val barrier = new CyclicBarrier(2)
    val results = new ConcurrentHashMap[Int, Int]()
    val threads = (0 until 2).map { id =>
      val th = new Thread(() => {
        barrier.await()
        // Both contenders sweep the same version numbers; per number,
        // exactly one createFile may succeed.
        results.put(id, (1 to 20).count(Snapshots.commitProbe(root, _)))
      })
      th.start(); th
    }
    threads.foreach(_.join())
    assert(results.values.asScala.sum == 20,
      s"each version claimed exactly once: $results")
  }

  test("two interleaved committers: one winner per version, no lost " +
      "snapshot, time-travel stays consistent") {
    val root = Lake.scratchDir("snap_race")
    val perWriter = 3
    val barrier = new CyclicBarrier(2)
    // committed version -> (writer, seq) as claimed by the committer
    val committed = new ConcurrentHashMap[Int, (Int, Int)]()
    val threads = (0 until 2).map { w =>
      val th = new Thread(() => {
        for (i <- 0 until perWriter) {
          barrier.await() // force both writers to race each commit
          val df = spark.range(5)
            .select(col("id"), lit(w).as("writer"), lit(i).as("seq"))
          val v = Snapshots.commitVersion(df, root)
          assert(committed.put(v, (w, i)) == null,
            s"version $v committed twice")
        }
      })
      th.start(); th
    }
    threads.foreach(_.join())
    // No lost snapshot: 2×3 commits → versions exactly 1..6, each
    // holding precisely its committer's rows (cross-version
    // contamination or an overwrite would break the tag readback).
    assert(committed.keySet.asScala.toSet == (1 to 2 * perWriter).toSet,
      s"got versions ${committed.keySet}")
    for ((v, (w, i)) <- committed.asScala) {
      val back = Snapshots.readVersion(spark, root, Some(v))
        .select(col("writer"), col("seq")).distinct().collect()
      assert(back.length == 1 && back.head.getInt(0) == w &&
        back.head.getInt(1) == i, s"v$v holds ${back.toSeq}, want ($w,$i)")
    }
    assert(Snapshots.latestVersion(root) == 2 * perWriter)
    // Time-travel consistency: a later commit must not move an old read.
    val v1Before = Snapshots.readVersion(spark, root, Some(1))
      .agg(sum(col("id"))).head.getLong(0)
    Snapshots.commitVersion(
      spark.range(3).select(col("id"), lit(9).as("writer"),
        lit(9).as("seq")), root)
    assert(Snapshots.latestVersion(root) == 2 * perWriter + 1)
    val v1After = Snapshots.readVersion(spark, root, Some(1))
      .agg(sum(col("id"))).head.getLong(0)
    assert(v1Before == v1After)
  }

  test("vacuum expires exactly the pre-cutoff versions and numbering " +
      "continues past it") {
    val root = Lake.scratchDir("snap_vac")
    for (i <- 1 to 4)
      Snapshots.commitVersion(
        spark.range(5).select(col("id"), lit(i).as("tag")), root)
    assert(Snapshots.vacuum(root, retain = 2) == Seq(1, 2))
    // Survivors intact, expired gone, latest unmoved.
    assert(Snapshots.latestVersion(root) == 4)
    for (v <- Seq(3, 4))
      assert(Snapshots.readVersion(spark, root, Some(v))
        .agg(max(col("tag"))).head.getInt(0) == v)
    for (v <- Seq(1, 2)) {
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, s"_commit_v$v")))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, s"v=$v")))
    }
    // Idempotent re-run finds nothing; commits keep numbering forward.
    assert(Snapshots.vacuum(root, retain = 2).isEmpty)
    assert(Snapshots.commitVersion(
      spark.range(1).select(col("id"), lit(5).as("tag")), root) == 5)
  }

  test("an unmarked data dir below the cutoff is swept once its claim " +
      "goes stale") {
    val root = Lake.scratchDir("snap_vac_crash")
    for (i <- 1 to 3)
      Snapshots.commitVersion(
        spark.range(3).select(col("id"), lit(i).as("tag")), root)
    // Model a crashed-writer residue: claimed + written, never
    // published (vacuum itself now deletes data BEFORE markers, so a
    // crashed vacuum leaves a committed — re-expirable — version, not
    // this shape).
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "_commit_v1"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "v=1")))
    // v1 is no longer committed, so the next vacuum reports nothing
    // expired — but must still sweep the orphaned directory. Its claim
    // is minutes old at most, so the DEFAULT grace protects it (the dir
    // is indistinguishable from an in-flight commitAudited stage)…
    assert(Snapshots.vacuum(root, retain = 2).isEmpty)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "v=1")),
      "fresh-claim orphan must survive the default grace")
    // …and grace 0 models the claim having aged past the window.
    assert(Snapshots.vacuum(root, retain = 2, orphanGraceMs = 0).isEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "v=1")), "orphan dir not swept")
    assert(Snapshots.latestVersion(root) == 3)
  }

  test("a vacuum that crashed after deleting data but before the marker " +
      "leaves a committed version the next run re-expires — and the " +
      "rename sidecar survives") {
    val root = Lake.scratchDir("snap_vac_reexpire")
    Snapshots.commitVersion(
      spark.range(2).select(col("id"), lit(1).as("tag")), root)
    // v2 renames tag→mark; v3 is latest
    assert(Snapshots.commitEvolvedWith(root, Map("mark" -> "tag"))(p =>
      spark.range(2).select(col("id"), lit(2).as("mark"))
        .write.parquet(p)) == 2)
    Snapshots.commitVersion(
      spark.range(2).select(col("id"), lit(3).as("mark")), root)
    // Simulate the new crash window: v2's data gone, marker still there.
    Lake.deleteRecursively(new java.io.File(s"$root/v=2"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_commit_v2")))
    // The next vacuum re-expires v2 (it is still COMMITTED), never
    // treating it as an orphan — so _renames_v2 must survive.
    assert(Snapshots.vacuum(root, retain = 1).contains(2))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_commit_v2")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_renames_v2")),
      "re-expire must not sweep the schema sidecar")
    assert(Snapshots.latestVersion(root) == 3)
  }

  test("in-flight staged dir (fresh claim, no marker) survives vacuum " +
      "even when racers push the cutoff past it") {
    val root = Lake.scratchDir("snap_vac_grace")
    // A slow audited writer has claimed + staged v1 but not published.
    assert(Snapshots.commitProbe(root, 1))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "v=1"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "v=1", "part-0.parquet"), "staged")
    // Racing writers publish v2..v4, pushing the retention cutoff past 1.
    for (i <- 2 to 4)
      Snapshots.commitVersion(
        spark.range(2).select(col("id"), lit(i).as("tag")), root)
    assert(Snapshots.vacuum(root, retain = 1) == Seq(2, 3))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "v=1", "part-0.parquet")),
      "vacuum swept an in-flight stage inside the grace window")
  }

  test("vacuum leaves an in-flight claim above the cutoff untouched") {
    val root = Lake.scratchDir("snap_vac_claim")
    for (i <- 1 to 3)
      Snapshots.commitVersion(
        spark.range(3).select(col("id"), lit(i).as("tag")), root)
    // A writer has claimed v4 but not yet published.
    assert(Snapshots.commitProbe(root, 4))
    assert(Snapshots.vacuum(root, retain = 1) == Seq(1, 2))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_claim_v4")),
      "vacuum must not steal an in-flight claim")
    // The in-flight writer's number is burned, the next commit skips it.
    assert(Snapshots.commitVersion(
      spark.range(1).select(col("id"), lit(9).as("tag")), root) == 5)
    assert(Snapshots.latestVersion(root) == 5)
  }

  test("a claimed-but-crashed writer leaves a gap, not a wedge") {
    val root = Lake.scratchDir("snap_crash")
    Snapshots.commitVersion(spark.range(2).toDF(), root)
    // Simulate a writer that claimed v2 and died before publishing.
    assert(Snapshots.commitProbe(root, 2))
    val v = Snapshots.commitVersion(spark.range(2).toDF(), root)
    assert(v == 3, s"next committer skips the orphaned claim, got v$v")
    assert(Snapshots.latestVersion(root) == 3)
  }

  test("a commit whose staged directory was swept fails, never " +
      "publishing a data-less version") {
    val root = Lake.scratchDir("snap_swept")
    assert(Snapshots.commitVersion(
      spark.range(3).select(col("id")), root) == 1)
    // Model the vacuum-outlives-audit race: the audit passes but the
    // staged v=2 directory is gone by publish time.
    val res = Snapshots.commitAudited(spark, root)(
      p => spark.range(2).select(col("id")).write.parquet(p)) { df =>
      df.collect() // audit reads the stage, then the sweep hits it
      Lake.deleteRecursively(new java.io.File(s"$root/v=2"))
      Right(())
    }
    assert(res.isLeft, s"commit over a swept stage must fail, got $res")
    assert(res.left.exists(_.contains("concurrency conflict")))
    assert(Snapshots.latestVersion(root) == 1,
      "a data-less version must never become committed")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_commit_v2")),
      "no commit marker may exist for the swept stage")
    // The table is not wedged: the next commit walks past the burned
    // claim and publishes normally.
    assert(Snapshots.commitVersion(
      spark.range(4).select(col("id")), root) == 3)
  }

  test("streaming batch commit: duplicate delivery is a no-op, a " +
      "crashed attempt recovers in place") {
    val root = Lake.scratchDir("stream_txn")
    def w(n: Int): String => Unit =
      p => spark.range(n).select(col("id")).write.mode("overwrite").parquet(p)
    assert(Snapshots.commitStreamBatch(root, 0L)(w(3)))
    // at-least-once redelivery after the marker landed: skipped
    assert(!Snapshots.commitStreamBatch(root, 0L)(w(3)))
    assert(Snapshots.latestVersion(root) == 1)
    // a crashed attempt at batch 1: claim taken, partial stage, no
    // marker — the retry (same single writer) rewrites and publishes
    assert(Snapshots.commitProbe(root, 2))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "v=2"))
    assert(Snapshots.commitStreamBatch(root, 1L)(w(5)))
    assert(Snapshots.latestVersion(root) == 2)
    assert(Snapshots.readVersion(spark, root, Some(2)).count() == 5)
    assert(Snapshots.readVersion(spark, root, Some(1)).count() == 3)
  }

  test("crash between multi-table txn stages stays invisible; the " +
      "marker is the only commit point") {
    val root = Lake.scratchDir("txn_crash")
    def writer(n: Int): String => Unit =
      p => spark.range(n).select(col("id")).write.parquet(p)
    assert(Snapshots.commitTxn(root,
      Seq("orders" -> writer(4), "lineitem" -> writer(6))) == 1)
    // Writer dies after staging ONE of the two tables of txn 2.
    Snapshots.stageTxnTable(root, "orders")(writer(99))
    val resolved = Snapshots.latestTxn(root)
    assert(resolved.map(_._1).contains(1),
      s"staged-only txn member leaked into resolution: $resolved")
    assert(Snapshots.readTxn(spark, root, "orders").count() == 4)
    assert(Snapshots.readTxn(spark, root, "lineitem").count() == 6)
    // A later full transaction commits past the residue and both
    // members flip together.
    assert(Snapshots.commitTxn(root,
      Seq("orders" -> writer(5), "lineitem" -> writer(7))) == 2)
    assert(Snapshots.readTxn(spark, root, "orders").count() == 5)
    assert(Snapshots.readTxn(spark, root, "lineitem").count() == 7)
    // Time travel through the old marker still yields the OLD pair.
    assert(Snapshots.readTxn(spark, root, "orders", Some(1)).count() == 4)
    assert(Snapshots.readTxn(spark, root, "lineitem", Some(1)).count() == 6)
  }
}
