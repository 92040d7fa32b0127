package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest / sink / catalog layer — the reference's actual core.
  *
  * The reference is a lake: TSV lands in a raw zone, a crawler infers
  * schemas into a catalog, one ETL job projects/renames/casts and writes
  * partitioned parquet, and a SQL engine queries the result
  * (reference: glue_scripts/scripts/csv_to_parquet.py:20-70 for the ETL;
  * stacks/demo_stack.py:130-187 for the crawler/classifier; :260-264 for
  * the query-results CSV sink). This object is that lifecycle as plain
  * Spark readers/writers — Catalyst keeps pushdown/pruning free.
  *
  * Scale notes: every reader emits a distributed scan (CSV/Parquet file
  * splits); writers shard by partition column (K1) so downstream scans
  * prune; nothing funnels through the driver.
  */
object Lake {

  /** One ApplyMapping entry: source column → destination name + type
    * (reference: ApplyMapping tuples, csv_to_parquet.py:40-47). */
  final case class Mapping(src: String, dst: String, dstType: String)

  // ------------------------------------------------------------ sources

  /** S1/S2/S4: delimited-text scan with the classifier's knobs — header
    * detection, quote char, value trimming, `\N` null sentinel, schema
    * inference (reference: read options csv_to_parquet.py:20-35;
    * classifier stacks/demo_stack.py:158-169). Gzip input (S2) is
    * transparent: Spark picks the codec from the file extension. */
  def readTsv(
      spark: SparkSession,
      path: String,
      header: Boolean = true,
      inferSchema: Boolean = true,
      sep: String = "\t",
      quote: String = "\"",
      trim: Boolean = true,
      nullValue: String = "\\N",
      mode: String = "PERMISSIVE",
      schema: Option[String] = None): DataFrame = {
    val r = spark.read
      .option("sep", sep)
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .option("quote", quote)
      .option("nullValue", nullValue)
      .option("ignoreLeadingWhiteSpace", trim.toString)
      .option("ignoreTrailingWhiteSpace", trim.toString)
      .option("mode", mode) // PERMISSIVE null-fills, DROPMALFORMED drops
    schema.fold(r)(r.schema).csv(path)
  }

  /** S3: crawler fallback without a classifier — no header row consumed,
    * every column lands as string `_c0.._cN` (reference: README.md:87-90,
    * "columns are not named and all types are string"). */
  def readAllString(spark: SparkSession, path: String, sep: String = "\t"): DataFrame =
    readTsv(spark, path, header = false, inferSchema = false, sep = sep,
      trim = false)

  /** S7: scan of a Hive-partitioned layout; a filter on the partition
    * column prunes directories before any IO (PartitionFilters in the
    * scan node — free from Catalyst on this layout). */
  def readPartitioned(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root)

  // ------------------------------------------------------------ transforms

  /** P1: ApplyMapping — ordered projection + rename + cast in one shot
    * (reference: csv_to_parquet.py:38-49). Casts use try_cast semantics
    * so a non-conforming value becomes null, never an error. */
  def applyMapping(df: DataFrame, mappings: Seq[Mapping]): DataFrame =
    df.select(mappings.map { m =>
      expr(s"try_cast(`${m.src}` AS ${m.dstType})").as(m.dst)
    }: _*)

  /** P2: choice-type resolution — a column whose values parse as more
    * than one primitive (int-or-`\N`-string, csv_to_parquet.py:43-44)
    * resolved to one type; non-parsing values → null. This is Glue's
    * `cast:`/`project:` mode; `make_struct`/`make_cols` below keep BOTH
    * representations. */
  def resolveChoice(df: DataFrame, colName: String, toType: String): DataFrame =
    df.withColumn(colName, expr(s"try_cast(`$colName` AS $toType)"))

  /** The per-type claim expressions behind make_struct/make_cols: each
    * value is claimed by the FIRST listed type it parses as (a choice
    * value has exactly one runtime type in Glue — the struct fields are
    * mutually exclusive, not parallel casts). List `string` last: it
    * parses everything. */
  private def choiceClaims(colName: String, types: Seq[String]): Seq[(String, String)] = {
    val c = s"`$colName`"
    types.zipWithIndex.map { case (t, i) =>
      val cond = (s"try_cast($c AS $t) IS NOT NULL" +:
        types.take(i).map(u => s"try_cast($c AS $u) IS NULL")).mkString(" AND ")
      (t, s"CASE WHEN $cond THEN try_cast($c AS $t) END")
    }
  }

  /** P2b: Glue `resolveChoice(choice = "make_struct")` — the column
    * becomes `struct<as_int:int, as_string:string, …>` with the value in
    * the one field matching its runtime type and NULL elsewhere; nothing
    * is lost, downstream projects whichever representation it wants. */
  def resolveChoiceStruct(df: DataFrame, colName: String,
      types: Seq[String]): DataFrame =
    df.withColumn(colName, expr(
      choiceClaims(colName, types)
        .map { case (t, claim) => s"'as_$t', $claim" }
        .mkString("named_struct(", ", ", ")")))

  /** P2b: Glue `resolveChoice(choice = "make_cols")` — like make_struct
    * but flattened: the choice column is replaced by one top-level
    * `<col>_<type>` column per candidate type. */
  def resolveChoiceCols(df: DataFrame, colName: String,
      types: Seq[String]): DataFrame =
    choiceClaims(colName, types).foldLeft(df) { case (d, (t, claim)) =>
      d.withColumn(s"${colName}_$t", expr(claim))
    }.drop(colName)

  /** K14: MERGE-style upsert (the Delta/Hudi/Iceberg `MERGE INTO`
    * shape, which plain parquet lakes lack): apply a change set —
    * full-width rows tagged `op` ∈ I (insert) / U (update) / D
    * (delete), keyed by `key` — to a base table in ONE full-outer
    * equi-join on the key. Unmatched base rows pass through, I/U rows
    * take the change's values wholesale (so an update CAN set a column
    * NULL), D rows vanish. One key-partitioned shuffle, no collect; at
    * 100 TB this is the copy-on-write merge job — bucketing both sides
    * on the key makes it shuffle-free. */
  def mergeChanges(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val cols = base.columns.toSeq
    val ch = changes.select(col(key).as("_k"), col(opCol).as("_op"),
      struct(cols.map(col): _*).as("_new"))
    base.join(ch, col(key) === col("_k"), "full_outer")
      .filter(coalesce(col("_op"), lit("")) =!= "D")
      .select(cols.map { c =>
        when(col("_op").isin("I", "U"), col("_new")(c))
          .otherwise(col(c)).as(c)
      }: _*)
  }

  // ------------------------------------------------------------ sinks

  /** K1 (partitionCols non-empty) / K2: parquet write, Hive-style
    * partitioned when asked (reference: partitionKeys=["birthYear"],
    * csv_to_parquet.py:58; plain write :62-70). */
  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** K3: query-results CSV sink — every Athena query result lands as
    * CSV-with-header at the workgroup output location
    * (stacks/demo_stack.py:260-264). Compared by re-read, not bytes. */
  def writeResultsCsv(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)

  /** TSV writer (fixture/egress helper; the raw zone's own format).
    * Nulls are written as the `\N` sentinel, gzip optional. */
  def writeTsv(df: DataFrame, path: String, header: Boolean = true,
      gzip: Boolean = false): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", header.toString)
      .option("nullValue", "\\N").option("emptyValue", "")
    (if (gzip) w.option("compression", "gzip") else w).csv(path)
  }

  /** K4: raw-zone bulk load — deploy local files under a zone prefix
    * (reference: BucketDeployment, stacks/demo_stack.py:76-84). */
  def bulkLoad(srcDir: String, dstDir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dst = Paths.get(dstDir)
    Files.createDirectories(dst)
    val ls = Files.list(Paths.get(srcDir))
    try ls.forEach { p =>
      if (Files.isRegularFile(p))
        Files.copy(p, dst.resolve(p.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING)
    } finally ls.close()
  }

  /** Small-file compaction — lake maintenance for tail-ingested zones
    * (thousands of tiny files per partition kill scan throughput at
    * scale: per-file open cost and lost vectorization). Rewrites a
    * parquet directory into ~`targetBytes`-sized files, preserving the
    * data exactly; sizing uses the on-disk footprint so the operation
    * never reads more than it rewrites. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    def du(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(du).sum
      else if (f.getName.endsWith(".parquet")) f.length else 0L
    val bytes = du(new java.io.File(path))
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = path + "_compacting"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    // Swap via rename-aside: the original data always survives (at the
    // live path or at _old) — a crash between the renames can leave the
    // live path briefly missing, but never destroys data; recovery is
    // renaming _old back.
    val dst = new java.io.File(path)
    val old = new java.io.File(path + "_old")
    deleteRecursively(old)
    if (!dst.renameTo(old)) {
      deleteRecursively(new java.io.File(tmp))
      throw new java.io.IOException(s"compaction: cannot move $path aside")
    }
    if (!new java.io.File(tmp).renameTo(dst)) {
      if (!old.renameTo(dst))
        throw new java.io.IOException(
          s"compaction swap failed for $path AND restore failed — " +
            s"original data is intact at $old")
      throw new java.io.IOException(
        s"compaction swap failed for $path (original restored)")
    }
    deleteRecursively(old)
  }

  /** Session+path-unique suffix for warehouse object names — concurrent
    * sessions share the warehouse dir, and a fixed name lets one session
    * overwrite another's tables mid-query (observed live). Unsigned so
    * an Int.MinValue hashCode can't put a '-' in an identifier. */
  def sessionSuffix(spark: SparkSession, dir: String): String =
    java.lang.Integer.toUnsignedString(
      (spark.sparkContext.applicationId + dir).hashCode)

  /** Recursive delete (no-op for missing paths) — shared by every
    * "clear a surviving warehouse/scratch location" site. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  // ------------------------------------------------------------ catalog

  /** K5/S5: register DataFrames in the session catalog under an optional
    * name prefix — the crawler's registration semantics
    * (stacks/demo_stack.py:144 `with_classifier_` prefix; consumed by
    * SQL at :272). */
  def register(spark: SparkSession, tables: Map[String, DataFrame],
      prefix: String = ""): Unit =
    tables.foreach { case (name, df) =>
      df.createOrReplaceTempView(prefix + name.replace(".", "_"))
    }

  /** Fresh scratch dir for round-trip pipelines. */
  def scratchDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_${tag}_").toString
}
