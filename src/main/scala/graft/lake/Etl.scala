package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import Lake.Mapping

/** The reference's one ETL job as a reusable pipeline
  * (glue_scripts/scripts/csv_to_parquet.py): TSV with `\N` nulls →
  * ApplyMapping (ordered project/rename/cast with choice resolution) →
  * TWO parquet writes, partitioned and flat (:52-70 — the reference
  * recomputes the scan per write; here the mapped frame is shared and
  * Spark's FileScan reuse keeps it one pass per write at scale).
  *
  * The mapped DataFrame is returned so callers can register it
  * (crawler step) and query it (the demo's ratings⋈basics join,
  * stacks/demo_stack.py:284-293).
  */
object Etl {

  /** name.basics ApplyMapping — the exact column contract of the
    * reference job (csv_to_parquet.py:40-47): birthYear/deathYear are
    * `choice` int-or-`\N` columns resolved to int-or-null. */
  val nameBasicsMapping: Seq[Mapping] = Seq(
    Mapping("nconst", "nconst", "string"),
    Mapping("primaryName", "primaryName", "string"),
    Mapping("birthYear", "birthYear", "int"),
    Mapping("deathYear", "deathYear", "int"),
    Mapping("primaryProfession", "primaryProfession", "string"),
    Mapping("knownForTitles", "knownForTitles", "string"))

  /** TSV → mapped → dual parquet (partitioned + flat). */
  def tsvToParquet(
      spark: SparkSession,
      srcDir: String,
      mappings: Seq[Mapping],
      outPartitioned: String,
      outFlat: String,
      partitionKeys: Seq[String]): DataFrame = {
    val raw = Lake.readTsv(spark, srcDir, inferSchema = false)
    val mapped = Lake.applyMapping(raw, mappings)
    Lake.writeParquet(mapped, outPartitioned, partitionKeys)
    Lake.writeParquet(mapped, outFlat)
    mapped
  }

  /** Slowly-changing-dimension Type-2 build — the warehouse pattern
    * for "what was this entity's attribute at time T": collapse an
    * append-only change feed into validity intervals per key, runs of
    * identical consecutive values becoming one row with
    * [effective_from, effective_to) and an is_current flag on the open
    * interval.
    *
    * Gaps-and-islands in two key-partitioned window passes over the
    * feed (change flag via lag, run id via running sum) plus one more
    * over the ~run-sized result (lead for the closing timestamp) — no
    * self-joins, nothing leaves its key partition, linear at any
    * scale. `orderCols` must totally order each key's feed (include a
    * tie-break id); `attrCol` must be non-null (lag's null marks
    * run starts). */
  def scd2(feed: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val flagged = feed.withColumn("chg",
      when(lag(col(attrCol), 1).over(w).isNull ||
        lag(col(attrCol), 1).over(w) =!= col(attrCol), 1L).otherwise(0L))
    val grouped = flagged.withColumn("version",
      sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = grouped.groupBy(col(keyCol), col("version"))
      .agg(min(col(attrCol)).as("attr_value"),
        min(col(tsCol)).as("effective_from"))
    val wv = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    runs
      .withColumn("effective_to", lead(col("effective_from"), 1).over(wv))
      .withColumn("is_current",
        when(col("effective_to").isNull, 1L).otherwise(0L))
  }
}
