package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session fixture — one local session across all suites (the
  * test JVM is forked once; getOrCreate dedupes). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    // events.ts is parquet INT64 TIMESTAMP(NANOS); set once at session
    // creation (Tables.load must not mutate session config mid-query).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  /** sf0.001 testdata root (TESTDATA.md). */
  val sf: String = "/root/testdata/sf0.001"

  def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()
}
