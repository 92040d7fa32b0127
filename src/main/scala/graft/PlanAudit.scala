package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints scale red flags per registered query —
  * cartesian products, broadcast-nested-loop joins, scans without
  * pushed filters, missing whole-stage codegen. Flags are advisory;
  * some are intended (j5_cross IS a cross join).
  *
  * Usage: runMain graft.PlanAudit [sfDir] [name1,name2,...]
  */
object PlanAudit {
  /** Scale red flags in an executed-plan string. Shared by the CLI and
    * `PlanAuditSpec`, which pins the exact expected-flag set so a plan
    * regression (new cartesian, lost codegen, SortAggregate creep)
    * fails `sbt test` instead of relying on a human reading the audit. */
  def flags(plan: String): Set[String] = Seq(
    "CartesianProduct" -> plan.contains("CartesianProduct"),
    "BroadcastNestedLoop" -> plan.contains("BroadcastNestedLoopJoin"),
    "NoCodegen" -> !plan.contains("*("), // codegen stages print as *(n)
    "SortAggregate" -> plan.contains("SortAggregate"),
  ).collect { case (f, true) => f }.toSet

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // AQE wraps plans in AdaptiveSparkPlan(isFinalPlan=false), hiding
      // codegen spans until execution — audit the static plan instead.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = args.lift(1).map(_.split(',').toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        val fs = flags(fn(spark, sfDir).queryExecution.executedPlan.toString())
        println(f"$name%-24s ${if (fs.isEmpty) "ok" else fs.toSeq.sorted.mkString(",")}")
      } catch {
        case e: Throwable =>
          println(f"$name%-24s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
