package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Plan-shape assertions: correctness is the oracle gate's job; these
  * pin the *physical* properties that matter at 100 TB — pushdown,
  * broadcast, top-k without a global sort. */
class RelationalPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    physicalPlan(SparkEntry.queries(name)(spark, sf))

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries("q1_agg")(spark, sf).count() == 6)
  }

  test("every query has an oracle — no silent rows-only entries") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("p5 filter pushes predicates into the parquet scan") {
    val p = plan("p5_filter")
    assert(p.contains("PushedFilters: [") && p.contains("l_quantity"),
      s"no pushdown in:\n$p")
  }

  test("j6 keeps the dimension side broadcast") {
    assert(plan("j6_broadcast").contains("BroadcastHashJoin"))
  }

  test("l3 top-k plans TakeOrderedAndProject, not a global sort") {
    assert(plan("l3_topk").contains("TakeOrderedAndProject"))
  }

  test("q1 aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate") &&
      p.contains("partial"), s"no partial aggregate in:\n$p")
  }

  test("j4 semi-join stays a real semi-join (no row explosion)") {
    assert(plan("j4_semi").contains("LeftSemi"))
  }

  test("scans prune columns: q1 reads only the columns it needs") {
    val p = plan("q1_agg")
    assert(!p.contains("l_partkey"),
      "q1 must not read l_partkey — column pruning is broken")
  }
}
