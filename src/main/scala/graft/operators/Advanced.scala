package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deeper SQL surface + scale-layout operators.
  *
  * The first group widens §2.3-2.9 coverage (subqueries, CTEs, grouping
  * sets, null-safe equality, offset, distribution windows, nested
  * types). The second group is physical-layout machinery that only
  * matters at scale: bucketed co-located joins (no exchange on either
  * side) and salted joins for skewed keys.
  */
object Advanced {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------- SQL surface

  /** P6: uncorrelated scalar subquery — deviation from the global mean.
    * Catalyst plans the subquery once and broadcasts the scalar. */
  private val p6ScalarSubquery: Q = (s, dir) => {
    Tables.register(s, dir)
    s.sql(
      """SELECT o_orderkey,
        |  round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4)
        |    AS dev
        |FROM orders WHERE o_orderkey <= 200
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** P7: correlated IN subquery (planned as a semi-join). */
  private val p7InSubquery: Q = (s, dir) => {
    Tables.register(s, dir)
    s.sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** P8: CTE + null-safe equality. The nullable branch exercises
    * `IS NOT DISTINCT FROM` (Spark `<=>`) on both engines. */
  private val p8CteNullsafe: Q = (s, dir) => {
    Tables.register(s, dir)
    s.sql(
      """WITH flagged AS (
        |  SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
        |  FROM customer)
        |SELECT a.c_custkey AS a_key, b.c_custkey AS b_key
        |FROM flagged a JOIN flagged b
        |  ON a.seg IS NOT DISTINCT FROM b.seg
        | AND a.c_custkey < b.c_custkey
        |WHERE a.c_custkey <= 20 AND b.c_custkey <= 20
        |ORDER BY a_key, b_key""".stripMargin)
  }

  /** P9: correlated EXISTS / NOT EXISTS — planned as semi/anti joins
    * (the remaining subquery shape after p6 scalar and p7 IN). */
  private val p9Exists: Q = (s, dir) => {
    Tables.register(s, dir)
    s.sql(
      """SELECT s_suppkey, s_name,
        |  EXISTS (SELECT 1 FROM lineitem
        |          WHERE l_suppkey = s_suppkey AND l_quantity > 49) AS has_bulk
        |FROM supplier
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_suppkey = s_suppkey AND l_discount > 0.09)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** W5: ntile — equi-depth bucketing within a partition (the remaining
    * ranking-family window after w1 rank/dense_rank/row_number). */
  private val w5Ntile: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("o_orderkey"))
  }

  /** A9: explicit GROUPING SETS with grouping() markers (rollup/cube are
    * the pre-canned shapes; this is the general one). */
  private val a9GroupingSets: Q = (s, dir) => {
    Tables.register(s, dir)
    s.sql(
      """SELECT coalesce(l_returnflag, '-') AS rf,
        |  coalesce(l_linestatus, '-') AS ls,
        |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin)
  }

  /** F14: DecimalType money math — exact decimal arithmetic end to end
    * (cast → subtract → multiply → sum/min/max), closing the Athena ANSI
    * type surface (SURVEY §1.3). Inputs are cast to DECIMAL(12,2) and
    * every intermediate stays decimal, so results are EXACT — no
    * floating rounding grid needed; outputs serialize as canonical
    * scale-preserving strings (both engines print identical plain
    * decimal forms, sidestepping sum-type precision differences). */
  private val f14Decimal: Q = (s, dir) => {
    Tables.register(s, dir)
    s.sql(
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS gross,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(38,4))) AS STRING) AS net,
        |  CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS min_price,
        |  CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** L4: LIMIT + OFFSET pagination (deterministic under total order). */
  private val l4Offset: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_orderkey"))
      .offset(50)
      .limit(10)

  /** L5: explicit NULL ordering — ANSI `NULLS FIRST/LAST` overrides of
    * both default directions (Spark defaults: asc→nulls first,
    * desc→nulls last; the query pins the opposite of each). The
    * nullable column is derived (`\N`-style choice resolution leaves
    * NULLs), the tie-break keeps the order total. */
  private val l5NullOrdering: Q = (s, dir) =>
    t(s, dir, "part")
      .select(col("p_partkey"),
        when(col("p_size") < 10, lit(null).cast("int"))
          .otherwise(col("p_size")).as("size_opt"))
      .orderBy(asc_nulls_last("size_opt"), desc("p_partkey"))
      .limit(200)

  /** W4: distribution windows — percent_rank / cume_dist over account
    * balances within a nation. */
  private val w4Distribution: Q = (s, dir) => {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal"), col("s_suppkey"))
    t(s, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy(col("s_nationkey"), col("s_suppkey"))
  }

  /** F9: nested types in-plan — rows → array<struct> via collect_list →
    * exploded back; the oracle is the identity (group/ungroup inverse). */
  private val f9NestedRt: Q = (s, dir) =>
    t(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(sort_array(collect_list(struct(col("n_nationkey"), col("n_name"))))
        .as("members"))
      .select(col("n_regionkey"), explode(col("members")).as("m"))
      .select(col("m.n_nationkey").as("n_nationkey"),
        col("m.n_name").as("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))

  /** F10: map type in-plan — entries → map_from_entries → map_entries
    * round trip (oracle is again the identity). */
  private val f10MapRt: Q = (s, dir) =>
    t(s, dir, "region")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("r_regionkey"), col("r_name"))))).as("m"))
      .select(explode(map_entries(col("m"))).as("e"))
      .select(col("e.key").as("r_regionkey"), col("e.value").as("r_name"))
      .orderBy(col("r_regionkey"))

  /** A10: PIVOT — status values become columns per priority row. */
  private val a10Pivot: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .orderBy(col("o_orderpriority"))

  /** A10b: UNPIVOT (melt) — wide back to long; the inverse shape. */
  private val a10Unpivot: Q = (s, dir) => {
    val wide = t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
    wide.unpivot(
      Array(col("o_orderpriority")),
      Array(col("F"), col("O"), col("P")),
      "status", "n")
      .orderBy(col("o_orderpriority"), col("status"))
  }

  // ------------------------------------------------- scale-layout ops

  /** Bucketed fact tables, prepared ONCE per (session, sfDir) — the
    * table prep is a layout decision (a fixture), not part of the join
    * under test; timing it inside the query hid the actual join cost
    * behind 5+ seconds of table writes. */
  private val bucketedReady =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def ensureBucketedTables(s: SparkSession, dir: String): (String, String) =
    bucketedReady.computeIfAbsent(
      s.sparkContext.applicationId + "|" + dir, { _ =>
        val sfx = graft.lake.Lake.sessionSuffix(s, dir)
        val (ordersTbl, lineitemTbl) =
          (s"graft_b_orders_$sfx", s"graft_b_lineitem_$sfx")
        // A fresh in-memory catalog doesn't know tables whose warehouse
        // location survived a previous session — drop both name and files.
        Seq(ordersTbl, lineitemTbl).foreach { tbl =>
          s.sql(s"DROP TABLE IF EXISTS $tbl")
          graft.lake.Lake.deleteRecursively(new java.io.File(
            s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl))
        }
        t(s, dir, "orders").write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(ordersTbl)
        t(s, dir, "lineitem").write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(lineitemTbl)
        (ordersTbl, lineitemTbl)
      })

  /** K6: bucketed co-located join — both fact tables bucketed on the
    * join key at write time, so the join needs NO exchange on either
    * side (the bucketing replaces the shuffle; at 100 TB this is the
    * difference between a join and a cluster-wide reshuffle). The first
    * call per (session, sf) prepares the bucketed tables; repeat calls
    * (and the bench, which warms up first) time only the join+agg. */
  private val k6BucketedJoin: Q = (s, dir) => {
    val (ordersTbl, lineitemTbl) = ensureBucketedTables(s, dir)
    s.table(lineitemTbl)
      .join(s.table(ordersTbl), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** The bucketed-join plan (for the no-exchange assertion in tests). */
  def bucketedJoinPlan(s: SparkSession, dir: String): DataFrame =
    k6BucketedJoin(s, dir)

  /** J8: salted equi-join for skewed keys — the big side salts each row
    * by a content hash, the small side explodes across all salt buckets,
    * so one hot key spreads over `buckets` reducers instead of one.
    * Result is identical to the plain join (the oracle checks that). */
  def saltedEquiJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, buckets: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(buckets)))
    val expanded = small.withColumn("_salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    salted.join(expanded,
      salted(bigKey) === expanded(smallKey) &&
        salted("_salt") === expanded("_salt"))
      .drop("_salt")
  }

  private val j8SaltedSkew: Q = (s, dir) =>
    saltedEquiJoin(t(s, dir, "lineitem"), "l_suppkey",
      t(s, dir, "supplier"), "s_suppkey", buckets = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
      .orderBy(col("s_nationkey"))

  /** Confs that let Catalyst's InjectRuntimeFilter fire at test scale:
    * its heuristics are sized for clusters (app-side scan must exceed
    * 10 GB by default), and the join must be a shuffle join (a
    * broadcast join already sees only matching rows). */
  private val bloomConfs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  /** The join under the bloom confs (shared with RelationalPlanSpec,
    * which pins `bloom_filter_might_contain` on the probe side). */
  def bloomJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > lit(200000.0))
    t(s, dir, "lineitem")
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("qty"))
  }

  /** J11: runtime Bloom-filter join pruning. Catalyst builds a Bloom
    * filter from the selectively-filtered dimension side of a shuffle
    * equi-join and applies `bloom_filter_might_contain` on the fact
    * side BEFORE its shuffle — at 100 TB the fact-table shuffle then
    * carries only rows that can possibly match, so shuffle volume
    * tracks the dimension filter's selectivity instead of the fact
    * table's size. The aggregate is materialized eagerly so the plan
    * compiles (and the filter injects) while the in-scope confs are
    * set; the session confs are restored before returning. */
  private val j11BloomJoin: Q = (s, dir) => {
    val saved = bloomConfs.map { case (k, _) => k -> s.conf.getOption(k) }
    bloomConfs.foreach { case (k, v) => s.conf.set(k, v) }
    val agg =
      try bloomJoinAgg(s, dir).localCheckpoint(true)
      finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    agg.orderBy(col("o_orderstatus"))
  }

  /** Q3-shaped analytics: 3-way join + filter + agg + top-k — the full
    * interactive-SQL workload shape, identical SQL text on both engines.
    * Catalyst broadcasts the filtered customer dimension and plans
    * TakeOrderedAndProject for the top-10. */
  /** A15: association-rule mining (support / confidence / lift) over
    * order baskets — the a-priori shape: the item-support filter prunes
    * the basket table BEFORE the pair self-join, so pair fanout is
    * C(basket,2) over frequent items only, never |items|². Everything
    * is equi-joins on narrow (order, item) rows; the two totals are
    * 1-row crossJoins. Ordered on the ROUNDED lift so the boundary is
    * engine-stable. */
  private val a15AssocRules: Q = (s, dir) => {
    val ob = t(s, dir, "lineitem")
      .join(t(s, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
      .distinct()
    associationRules(ob, minSup = 20, k = 50)
  }

  /** Rule mining over a deduplicated (o, b) basket-membership table;
    * see [[a15AssocRules]] for the shape discussion. */
  def associationRules(ob: DataFrame, minSup: Int, k: Int): DataFrame = {
    val tot = ob.agg(countDistinct(col("o")).cast("double").as("n_orders"))
    val sup = ob.groupBy(col("b"))
      .agg(count(lit(1)).cast("double").as("supp"))
      .filter(col("supp") >= minSup)
    // a-priori prune: only frequent items enter the pair join
    val freq = ob.join(sup.select(col("b")), Seq("b"))
    val pairs = freq.select(col("o"), col("b").as("b1"))
      .join(freq.select(col("o"), col("b").as("b2")), Seq("o"))
      .filter(col("b1") < col("b2"))
      .groupBy(col("b1"), col("b2"))
      .agg(count(lit(1)).cast("double").as("sup12"))
      .filter(col("sup12") >= minSup)
    pairs
      .join(sup.select(col("b").as("b1"), col("supp").as("sup1")), Seq("b1"))
      .join(sup.select(col("b").as("b2"), col("supp").as("sup2")), Seq("b2"))
      .crossJoin(tot)
      .select(col("b1"), col("b2"), col("sup12").cast("long").as("pair_n"),
        round(col("sup12") / col("sup1"), 4).as("conf_fwd"),
        round(col("sup12") / col("sup2"), 4).as("conf_rev"),
        round(col("sup12") * col("n_orders") / (col("sup1") * col("sup2")),
          4).as("lift"))
      .orderBy(col("lift").desc, col("b1"), col("b2"))
      .limit(k)
  }

  private val q3Shipping: Q = (s, dir) => {
    Tables.register(s, dir)
    s.sql(
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin)
  }

  /** Q5-shaped analytics: 6-way star join with a same-nation predicate. */
  private val q5LocalSupplier: Q = (s, dir) => {
    Tables.register(s, dir)
    s.sql(
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q3_shipping" -> q3Shipping,
    "q5_local_supplier" -> q5LocalSupplier,
    "p6_scalar_subquery" -> p6ScalarSubquery,
    "p7_in_subquery" -> p7InSubquery,
    "p8_cte_nullsafe" -> p8CteNullsafe,
    "p9_exists" -> p9Exists,
    "w5_ntile" -> w5Ntile,
    "a9_grouping_sets" -> a9GroupingSets,
    "a10_pivot" -> a10Pivot,
    "a10_unpivot" -> a10Unpivot,
    "l4_offset" -> l4Offset,
    "l5_null_ordering" -> l5NullOrdering,
    "f14_decimal" -> f14Decimal,
    "w4_distribution" -> w4Distribution,
    "f9_nested_rt" -> f9NestedRt,
    "f10_map_rt" -> f10MapRt,
    "k6_bucketed_join" -> k6BucketedJoin,
    "j8_salted_skew" -> j8SaltedSkew,
    "j11_bloom_join" -> j11BloomJoin,
    "a15_assoc_rules" -> a15AssocRules,
  )

  val oracles: Map[String, String] = Map(
    "a15_assoc_rules" ->
      """WITH ob AS (
        |  SELECT DISTINCT l_orderkey AS o, p_brand AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT count(DISTINCT o)::DOUBLE AS n_orders FROM ob),
        |sup AS (
        |  SELECT b, count(*)::DOUBLE AS supp FROM ob GROUP BY b
        |  HAVING count(*) >= 20),
        |freq AS (SELECT ob.o, ob.b FROM ob JOIN sup ON ob.b = sup.b),
        |pairs AS (
        |  SELECT x.b AS b1, y.b AS b2, count(*)::DOUBLE AS sup12
        |  FROM freq x JOIN freq y ON x.o = y.o AND x.b < y.b
        |  GROUP BY x.b, y.b HAVING count(*) >= 20)
        |SELECT b1, b2, sup12::BIGINT AS pair_n,
        |  round(sup12 / s1.supp, 4) AS conf_fwd,
        |  round(sup12 / s2.supp, 4) AS conf_rev,
        |  round(sup12 * n_orders / (s1.supp * s2.supp), 4) AS lift
        |FROM pairs CROSS JOIN tot
        |JOIN sup s1 ON pairs.b1 = s1.b
        |JOIN sup s2 ON pairs.b2 = s2.b
        |ORDER BY lift DESC, b1, b2 LIMIT 50""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "p6_scalar_subquery" ->
      """SELECT o_orderkey,
        | round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4) AS dev
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin,
    "p7_in_subquery" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,
    "p8_cte_nullsafe" ->
      """WITH flagged AS (
        |  SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
        |  FROM customer)
        |SELECT a.c_custkey AS a_key, b.c_custkey AS b_key
        |FROM flagged a JOIN flagged b
        |  ON a.seg IS NOT DISTINCT FROM b.seg
        | AND a.c_custkey < b.c_custkey
        |WHERE a.c_custkey <= 20 AND b.c_custkey <= 20
        |ORDER BY a_key, b_key""".stripMargin,
    "p9_exists" ->
      """SELECT s_suppkey, s_name,
        |  EXISTS (SELECT 1 FROM lineitem
        |          WHERE l_suppkey = s_suppkey AND l_quantity > 49) AS has_bulk
        |FROM supplier
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_suppkey = s_suppkey AND l_discount > 0.09)
        |ORDER BY s_suppkey""".stripMargin,
    "w5_ntile" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER (PARTITION BY o_orderstatus
        |                 ORDER BY o_totalprice, o_orderkey) AS quartile
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin,
    "a9_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '-') AS rf,
        |  coalesce(l_linestatus, '-') AS ls,
        |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    "a10_pivot" ->
      """PIVOT (SELECT o_orderpriority, o_orderstatus FROM orders)
        |ON o_orderstatus IN ('F','O','P') USING count(*)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a10_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus AS status, count(*) AS n
        |FROM orders GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority, status""".stripMargin,
    "l4_offset" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY o_orderkey LIMIT 10 OFFSET 50""".stripMargin,
    "l5_null_ordering" ->
      """SELECT p_partkey,
        | CASE WHEN p_size < 10 THEN NULL ELSE p_size END AS size_opt
        |FROM part
        |ORDER BY size_opt ASC NULLS LAST, p_partkey DESC
        |LIMIT 200""".stripMargin,
    "f14_decimal" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS gross,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(38,4))) AS VARCHAR) AS net,
        |  CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS min_price,
        |  CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "w4_distribution" ->
      """SELECT s_nationkey, s_suppkey,
        | round(percent_rank() OVER w, 6) AS pr,
        | round(cume_dist() OVER w, 6) AS cd
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin,
    "f9_nested_rt" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "f10_map_rt" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "k6_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        | round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "j8_salted_skew" ->
      """SELECT s_nationkey, count(*) AS n,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "j11_bloom_join" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        | round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
