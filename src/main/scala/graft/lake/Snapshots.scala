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

  val queries: Map[String, Q] = Map(
    "k15_timetravel" -> k15Timetravel,
  )

  val oracles: Map[String, String] = Map(
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
