package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the driver-generated testdata tables (TESTDATA.md).
  *
  * Mirrors the reference's catalog model — a table is a path prefix of
  * columnar files registered under a name (reference:
  * stacks/demo_stack.py:94-100 two Glue DBs; crawler registration at
  * :143-144). Here the "catalog" is the SparkSession's own; `register`
  * is the Spark analogue of a crawler run over a folder-per-table layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // `events.ts` has shipped under two parquet encodings: INT64
    // TIMESTAMP(NANOS) (reads as LongType under
    // `spark.sql.legacy.parquet.nanosAsLong=true`, which all graft entry
    // points set) and plain timestamp[us] (reads as TIMESTAMP_NTZ, exact
    // vs the DuckDB oracle under the UTC session). Dispatch on the type
    // actually read so both encodings normalize to one TIMESTAMP column:
    // a long is nanos → rebuild (lossless, generator emits whole micros);
    // a timestamp passes through (NTZ cast to TIMESTAMP is exact in UTC).
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      val df = spark.read.parquet(path(dir, name))
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df // already TIMESTAMP
      }
    } else spark.read.parquet(path(dir, name))
  }

  /** Scale-adaptive first-stage parallelism guard (optimization guide
    * §2.5 "input skew" / §6 input split size). The testdata parquet
    * ships ONE row group per table, so a scan yields ONE input
    * partition and every expensive per-row map stage (image/audio
    * codecs, regex scans, shingling, hashing) runs on a single core
    * until the first exchange — a 32-core session executes its map
    * work serially. Repartition ONLY when the scan yields fewer
    * partitions than the session's default parallelism: at cluster
    * scale (many files / row groups) the guard is the identity, so no
    * payload shuffle is ever added where the input is already
    * parallel, and locally the narrow rows it does move are trivial
    * next to the map work they unlock. Streaming frames pass through
    * untouched (micro-batch partitioning is the replay harness's
    * contract, and `.rdd` is illegal on them). */
  def spread(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }

  /** Register every testdata table as a temp view, optionally name-prefixed
    * (the reference prefixes crawler output, demo_stack.py:144/:186). */
  def register(spark: SparkSession, dir: String, prefix: String = ""): Unit =
    names.foreach { n =>
      load(spark, dir, n).createOrReplaceTempView(prefix + n)
    }
}
