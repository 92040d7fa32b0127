package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Task-retry resilience — the cluster contract local runs never
  * exercise: on 1000 executors, tasks FAIL (preemption, OOM-kill, bad
  * node) and the engine reruns them; a query is 100 TB-ready only if a
  * rerun task cannot change its answer. This suite runs its own
  * session with `local[4, 3]` (maxFailures = 3 — the plain `local[4]`
  * master the shared fixture uses fails the whole job on the FIRST
  * task failure, so retries are untestable there), injects a
  * deterministic first-attempt failure into chosen partitions both
  * BEFORE and AFTER a shuffle, and requires the flaky run's result to
  * equal the clean run's bit-for-bit. Integer aggregates by design:
  * the equality under test is the retry contract, not FP summation
  * order. The injection counter is a JVM-static (accumulator updates
  * from failed attempts are discarded by design, which is itself part
  * of the exactness story — a failed task contributes NOTHING).
  */
class FaultToleranceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    // Tear down the shared local[4] context (if an earlier suite made
    // it) so this builder's master takes effect; afterAll restores the
    // world by stopping ours — later suites lazily recreate theirs.
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.builder()
      .master("local[4, 3]") // 4 threads, 3 task attempts
      .appName("graft-fault-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
  }

  override def afterAll(): Unit =
    SparkSession.getActiveSession.foreach(_.stop())

  private val sf = "/root/testdata/sf0.001"

  /** (group → (count, keysum)) with optional first-attempt failures
    * injected pre-shuffle (map side) and post-shuffle (reduce side). */
  private def grouped(flaky: Boolean): Map[Long, (Long, Long)] = {
    import spark.implicits._
    FaultToleranceSpec.injected.set(0)
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber").cast("long"))
      .as[(Long, Long)]
      .repartition(8)
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (flaky && tc.partitionId() == 3 && tc.attemptNumber() == 0) {
          FaultToleranceSpec.injected.incrementAndGet()
          throw new RuntimeException("injected map-side task failure")
        }
        it
      }
      .groupByKey { case (k, _) => k % 16 }
      .mapGroups { (g, rs) =>
        val tc = TaskContext.get()
        // Partition 0 always survives AQE's small-partition coalesce.
        if (flaky && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
          FaultToleranceSpec.injected.incrementAndGet()
          throw new RuntimeException("injected reduce-side task failure")
        }
        var n = 0L; var s = 0L
        rs.foreach { case (k, ln) => n += 1; s += k + ln }
        (g, n, s)
      }
    rows.collect().map { case (g, n, s) => g -> (n, s) }.toMap
  }

  test("map-side and reduce-side task failures retry to the exact result") {
    val clean = grouped(flaky = false)
    assert(FaultToleranceSpec.injected.get() == 0)
    val flaky = grouped(flaky = true)
    assert(FaultToleranceSpec.injected.get() >= 2,
      "both injected failures must actually fire")
    assert(flaky == clean,
      "a retried task changed the result — rerun is not exact")
    assert(clean.values.map(_._1).sum ==
      spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("a task that exhausts maxFailures fails the job loudly") {
    import spark.implicits._
    val ex = intercept[org.apache.spark.SparkException] {
      spark.range(100).repartition(4).mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.partitionId() == 2)
          throw new RuntimeException("always failing")
        it
      }.count()
    }
    assert(ex.getMessage.contains("always failing"),
      "the root cause must surface, not a silent wrong answer")
  }
}

object FaultToleranceSpec {
  /** JVM-static injection counter: accumulators drop failed-attempt
    * updates, so a plain atomic is the only honest count in local
    * mode. */
  val injected = new java.util.concurrent.atomic.AtomicInteger(0)
}
