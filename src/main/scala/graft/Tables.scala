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
    // The testdata writes `events.ts` as parquet INT64 TIMESTAMP(NANOS),
    // which Spark 4 refuses by default. Sessions must set
    // `spark.sql.legacy.parquet.nanosAsLong=true` at creation (all graft
    // entry points do — load() deliberately does NOT mutate session
    // config: that would silently change semantics of unrelated reads
    // and be ordering-dependent under concurrency). The nanos long is
    // rebuilt into a (lossless — the generator emits whole microseconds)
    // timestamp.
    if (name == "events") {
      spark.read.parquet(path(dir, name))
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(path(dir, name))
  }

  /** Register every testdata table as a temp view, optionally name-prefixed
    * (the reference prefixes crawler output, demo_stack.py:144/:186). */
  def register(spark: SparkSession, dir: String, prefix: String = ""): Unit =
    names.foreach { n =>
      load(spark, dir, n).createOrReplaceTempView(prefix + n)
    }
}
