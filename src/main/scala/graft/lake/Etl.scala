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
}
