package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.Tables

/** Versioned table snapshots with time-travel reads — the Delta/Iceberg
  * capability a plain-parquet lake lacks (the reference's tables are
  * overwrite-in-place; an analyst cannot ask "what did this table say
  * yesterday"). Layout: each version is an immutable directory
  * `<root>/v=<n>/`; `_latest` is a one-line manifest naming the current
  * version, committed by write-temp-then-atomic-rename so a reader
  * never sees a half-written pointer.
  *
  * Scale shape: a snapshot write is exactly one parquet write (no
  * rewrite of history); version resolution reads a one-line file; a
  * time-travel read is an ordinary pruned scan of one immutable
  * directory. Storage is per-version full copies — the honest tradeoff
  * vs manifest-of-files designs, noted here; the READ API is identical.
  */
object Snapshots {

  type Q = (SparkSession, String) => DataFrame

  private def manifest(root: String) = Paths.get(root, "_latest")

  /** Write `df` as version `v` and advance the manifest. */
  def writeVersion(df: DataFrame, root: String, v: Int): Unit = {
    Lake.writeParquet(df, s"$root/v=$v")
    val tmp = Paths.get(root, s"_latest.tmp$v")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, manifest(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def latestVersion(root: String): Int =
    Files.readString(manifest(root)).trim.toInt

  /** Read a specific version, or the manifest's latest. */
  def readVersion(s: SparkSession, root: String,
      version: Option[Int] = None): DataFrame =
    s.read.parquet(s"$root/v=${version.getOrElse(latestVersion(root))}")

  // ------------------------------------------------------------ queries

  /** K15: two snapshot writes, then BOTH a time-travel read of v1 and
    * a latest read of v2 in one result — the oracle reconstructs each
    * version set-algebraically, so reading the wrong version, a stale
    * manifest, or cross-version contamination all hash-fail. */
  private val k15Timetravel: Q = (s, dir) => {
    val root = Lake.scratchDir("k15")
    val part = Tables.load(s, dir, "part")
    writeVersion(part.filter(col("p_partkey") % 2 === 0), root, 1)
    writeVersion(part.withColumn("p_retailprice",
      when(col("p_partkey") % 3 === 0,
        round(col("p_retailprice") + 10, 2))
        .otherwise(col("p_retailprice"))), root, 2)
    def agg(df: DataFrame, label: String) = df.agg(
      count(lit(1)).as("n"), sum(col("p_partkey")).as("sum_keys"),
      round(sum(col("p_retailprice")), 2).as("sum_price"))
      .select(lit(label).as("snap"), col("n"), col("sum_keys"),
        col("sum_price"))
    agg(readVersion(s, root, Some(1)), "v1_travel")
      .unionByName(agg(readVersion(s, root), "v2_latest"))
      .orderBy(col("snap"))
  }

  /** K16: right-to-be-forgotten cascade purge — the compliance delete
    * every lake must support: a subject list (customers with
    * c_custkey % 97 = 0 stands in for the real request queue) removes
    * the customers, THEIR orders, and those orders' lineitems — the
    * referential cascade done with broadcast-able anti-joins (subject
    * and removed-order key sets are request-sized, never fact-sized).
    * The audit artifact is per-table before/removed/after counts plus
    * a surviving-key checksum; the oracle reconstructs the cascade
    * set-algebraically, so an under-purge (orphan lineitems) or
    * over-purge both hash-fail. */
  private val k16Forget: Q = (s, dir) => {
    val subjects = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
    val cust = Tables.load(s, dir, "customer")
    val orders = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    val custKept = cust.join(broadcast(subjects), Seq("c_custkey"), "left_anti")
    val removedOrders = orders.join(broadcast(subjects),
      orders("o_custkey") === subjects("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    val ordersKept = orders.join(broadcast(subjects),
      orders("o_custkey") === subjects("c_custkey"), "left_anti")
    val liKept = li.join(broadcast(removedOrders),
      li("l_orderkey") === removedOrders("o_orderkey"), "left_anti")
    def audit(label: String, before: DataFrame, after: DataFrame,
        key: String) =
      before.agg(count(lit(1)).as("n_before")).crossJoin(
        after.agg(count(lit(1)).as("n_after"),
          sum(col(key)).as("sum_keys_after")))
        .select(lit(label).as("tbl"), col("n_before"),
          (col("n_before") - col("n_after")).as("n_removed"),
          col("n_after"), col("sum_keys_after"))
    audit("1_customer", cust, custKept, "c_custkey")
      .unionByName(audit("2_orders", orders, ordersKept, "o_orderkey"))
      .unionByName(audit("3_lineitem", li, liKept, "l_orderkey"))
      .orderBy(col("tbl"))
  }

  val queries: Map[String, Q] = Map(
    "k15_timetravel" -> k15Timetravel,
    "k16_forget" -> k16Forget,
  )

  val oracles: Map[String, String] = Map(
    "k16_forget" ->
      """WITH subj AS (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |ro AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM subj))
        |SELECT * FROM (
        |  SELECT '1_customer' AS tbl,
        |    (SELECT count(*) FROM customer)::BIGINT AS n_before,
        |    (SELECT count(*) FROM subj)::BIGINT AS n_removed,
        |    (SELECT count(*) FROM customer
        |     WHERE c_custkey NOT IN (SELECT c_custkey FROM subj))::BIGINT
        |      AS n_after,
        |    (SELECT sum(c_custkey) FROM customer
        |     WHERE c_custkey NOT IN (SELECT c_custkey FROM subj))::BIGINT
        |      AS sum_keys_after
        |  UNION ALL
        |  SELECT '2_orders',
        |    (SELECT count(*) FROM orders)::BIGINT,
        |    (SELECT count(*) FROM ro)::BIGINT,
        |    (SELECT count(*) FROM orders
        |     WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ro))::BIGINT,
        |    (SELECT sum(o_orderkey) FROM orders
        |     WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ro))::BIGINT
        |  UNION ALL
        |  SELECT '3_lineitem',
        |    (SELECT count(*) FROM lineitem)::BIGINT,
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_orderkey IN (SELECT o_orderkey FROM ro))::BIGINT,
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM ro))::BIGINT,
        |    (SELECT sum(l_orderkey) FROM lineitem
        |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM ro))::BIGINT
        |) ORDER BY tbl""".stripMargin,
    "k15_timetravel" ->
      """SELECT * FROM (
        |  SELECT 'v1_travel' AS snap, count(*)::BIGINT AS n,
        |    sum(p_partkey)::BIGINT AS sum_keys,
        |    round(sum(p_retailprice), 2) AS sum_price
        |  FROM part WHERE p_partkey % 2 = 0
        |  UNION ALL
        |  SELECT 'v2_latest', count(*)::BIGINT, sum(p_partkey)::BIGINT,
        |    round(sum(CASE WHEN p_partkey % 3 = 0
        |                   THEN round(p_retailprice + 10, 2)
        |                   ELSE p_retailprice END), 2)
        |  FROM part
        |) ORDER BY snap""".stripMargin,
  )
}
