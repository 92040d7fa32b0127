package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns (EXT, SURVEY §2.12 E5): media as opaque binary
  * with typed metadata, and `array<float>` embeddings flowing through
  * the relational operators unchanged.
  *
  * The decode step (image/audio → pixels/samples) is STUBBED — the
  * container has no media libraries — with a clearly-marked
  * deterministic fake. The Spark-side plumbing (schema, batching,
  * partition-parallel extraction, downstream joins/aggs over the
  * features) is real and oracle-tested.
  */
object Multimodal {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  /** Byte length / digest / head bytes of a binary column — the typed
    * metadata every media column carries. */
  def binaryMeta(bin: Column): Seq[Column] = Seq(
    length(bin).as("n_bytes"),
    md5(bin).as("digest"),
    upper(hex(substring(bin, 1, 8))).as("head8"))

  /** STUB media decoder: a real pipeline would decode pixels/samples
    * here (e.g. via a vectorized UDF batching rows per partition). This
    * deterministic fake derives `dim` floats in [0,1) from seeded hashes
    * of the bytes, preserving the exact schema and distribution shape a
    * real extractor produces: binary → array<float>, map-only. */
  def fakeDecodeFeatures(bin: Column, dim: Int): Column =
    transform(sequence(lit(1), lit(dim)),
      i => (pmod(xxhash64(bin, i), lit(1000000)).cast("double") / 1000000.0)
        .cast("float"))

  // ------------------------------------------------------------ queries

  /** E5: binary passthrough — text bytes as an opaque binary column with
    * derived metadata (the oracle recomputes digests over the same
    * bytes). */
  private val e5BinaryMeta: Q = (s, dir) => {
    val bin = col("text").cast("binary")
    t(s, dir, "documents")
      .select(col("doc_id") +: binaryMeta(bin): _*)
      .orderBy(col("doc_id"))
  }

  /** E5b: `array<float>` through join + aggregation — embeddings joined
    * to document metadata, per (label, lang) squared-norm averages. The
    * vector column survives the join shuffle intact. */
  private val e5VectorJoin: Q = (s, dir) => {
    val v = transform(col("embedding"), _.cast("double"))
    val normSq = aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x)
    t(s, dir, "embeddings")
      .join(t(s, dir, "documents"), col("vec_id") === col("doc_id"))
      .groupBy(col("label"), col("lang"))
      .agg(count(lit(1)).as("n"),
        round(avg(normSq), 4).as("avg_norm_sq"))
      .orderBy(col("label"), col("lang"))
  }

  val queries: Map[String, Q] = Map(
    "e5_binary_meta" -> e5BinaryMeta,
    "e5_vector_join" -> e5VectorJoin,
  )

  val oracles: Map[String, String] = Map(
    "e5_binary_meta" ->
      """SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS digest,
        | upper(hex(substr(text, 1, 8))) AS head8
        |FROM documents ORDER BY doc_id""".stripMargin,
    "e5_vector_join" ->
      """SELECT label, lang, count(*) AS n,
        | round(avg(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4)
        |   AS avg_norm_sq
        |FROM embeddings JOIN documents ON vec_id = doc_id
        |GROUP BY label, lang ORDER BY label, lang""".stripMargin,
  )
}
