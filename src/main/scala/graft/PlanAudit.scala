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
  def flags(plan: org.apache.spark.sql.execution.SparkPlan): Set[String] = {
    val s = plan.toString()
    Seq(
      "CartesianProduct" -> s.contains("CartesianProduct"),
      "BroadcastNestedLoop" -> s.contains("BroadcastNestedLoopJoin"),
      "NoCodegen" -> !s.contains("*("), // codegen stages print as *(n)
      "SortAggregate" -> s.contains("SortAggregate"),
      // unpartitioned window funneling its full input through one task —
      // the e2_containment vocab-rank class of scale bug (round-11 weak).
      // A plain `Exchange SinglePartition` substring is NOT the signal:
      // every global aggregate funnels ONE ROW per partition through one
      // (benign) — the red flag is a Window/Sort whose shuffle input is
      // SinglePartition, i.e. corpus-sized data sorted on one task.
      "SinglePartitionWindow" -> singlePartitionWindow(plan),
    ).collect { case (f, true) => f }.toSet
  }

  /** True iff some Window (or window-group-limit) node's nearest
    * upstream shuffle is `Exchange SinglePartition` — reached without
    * passing through an aggregate (whose single-partition funnel moves
    * one row per partition, not the corpus) or another exchange. */
  private def singlePartitionWindow(
      plan: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExecBase
    def scan(p: SparkPlan, underWindow: Boolean): Boolean = p match {
      case e: ShuffleExchangeLike =>
        (underWindow && e.outputPartitioning == SinglePartition) ||
          e.children.exists(scan(_, underWindow = false))
      case _: BaseAggregateExec =>
        p.children.exists(scan(_, underWindow = false))
      case _: WindowExecBase =>
        p.children.exists(scan(_, underWindow = true))
      case w if w.nodeName.contains("WindowGroupLimit") =>
        p.children.exists(scan(_, underWindow = true))
      case _ => p.children.exists(scan(_, underWindow))
    }
    scan(plan, underWindow = false)
  }

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
        val fs = flags(fn(spark, sfDir).queryExecution.executedPlan)
        println(f"$name%-24s ${if (fs.isEmpty) "ok" else fs.toSeq.sorted.mkString(",")}")
      } catch {
        case e: Throwable =>
          println(f"$name%-24s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
