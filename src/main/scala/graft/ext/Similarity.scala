package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over an embedding column (EXT, SURVEY §2.12 E3).
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the (small)
  * query set, compute dot products map-side over the corpus — the corpus
  * never shuffles, and per-query top-k is a windowed rank over q×corpus
  * scores. The scale path is hyperplane LSH (random-projection sign
  * bits): bucket join on signature bands, exact refinement on candidates
  * only.
  */
object Similarity {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  /** Float embedding → double array (pin the arithmetic to double so
    * results are engine-stable). */
  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** E3: exact cosine top-k — for each query vector, the k nearest
    * corpus vectors by cosine similarity. Queries are broadcast; ties
    * broken by corpus id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"), round(col("cos"), 6).as("sim"))
  }

  /** Random-hyperplane signature: one sign bit per plane, packed into a
    * long (P(bit differs) = angle/π, so near vectors share buckets).
    * Native codegen'd expression — coefficients are hash-derived ±1,
    * identical on every executor, never materialized as plan literals. */
  def hyperplaneSignature(vec: Column, nPlanes: Int, seed: Long): Column =
    graft.functions.HyperplaneSig.hyperplaneSig(vec, nPlanes, seed)

  /** E3b: ANN candidates via multi-table hyperplane LSH — vectors
    * sharing any table's full signature are candidates. Returns
    * (q_id, c_id) candidate pairs. */
  def annCandidates(vecs: DataFrame, nTables: Int, bitsPerTable: Int): DataFrame = {
    val v = vecs.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val sigs = (0 until nTables).foldLeft(v) { (df, t) =>
      df.withColumn(s"sig_$t",
        hyperplaneSignature(col("v"), bitsPerTable, seed = 1000 + t))
    }
    val buckets = sigs.select(col("vec_id"),
      explode(array((0 until nTables).map { t =>
        struct(lit(t).as("t"), col(s"sig_$t").as("sig"))
      }: _*)).as("bk"))
    buckets.as("a").join(buckets.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("c_id"))
      .distinct()
  }

  // ------------------------------------------------------------ queries

  /** E3: exact cosine top-5 for the first 5 vectors, against the full
    * corpus — DuckDB recomputes it from the same parquet. */
  private val e3CosineTopk: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** E3b: ANN self-check — LSH candidate recall of the exact top-5 must
    * clear 0.5, while candidate volume stays under 40% of all-pairs
    * (the point of LSH). Emits two booleans for the constant oracle. */
  private val e3AnnRecall: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val exact = bruteForceTopK(emb.filter(col("vec_id") < 50), emb, k = 5)
      .select(col("q_id"), col("c_id"))
    // The synthetic embeddings are weakly clustered (top-5 cosine ≈ 0.33
    // vs 0.0 random): 20 tables × 6 bits give ~0.63 expected recall at
    // ~27% candidate volume. Denser data needs fewer/wider tables.
    val cand = annCandidates(emb, nTables = 20, bitsPerTable = 6)
    // All four scalars in ONE returned plan (no driver-side actions);
    // the exact top-k subtree is shared between total and hits.
    val hitsAgg = exact.join(cand, Seq("q_id", "c_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val candAgg = cand.agg(count(lit(1)).as("n_cand"))
    val nAgg = emb.agg(count(lit(1)).as("n"))
    hitsAgg.crossJoin(totalAgg).crossJoin(candAgg).crossJoin(nAgg).select(
      (col("hits").cast("double") / col("total") >= 0.5).as("recall_ok"),
      (col("n_cand").cast("double") / (col("n") * (col("n") - 1)) <= 0.4)
        .as("cand_frac_ok"))
  }

  /** E3c: embedding-cosine near-duplicate pairs — exact all-pairs here
    * (the corpus is the query set); at scale the identical refinement
    * runs over annCandidates buckets instead of the full cross product.
    * Threshold 0.45 sits just under the corpus max (0.513). */
  private val e3CosineNearDup: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= 0.45)
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"),
        round(col("cos"), 6).as("sim"))
      .orderBy(col("a"), col("b"))
  }

  val queries: Map[String, Q] = Map(
    "e3_cosine_topk" -> e3CosineTopk,
    "e3_ann_recall" -> e3AnnRecall,
    "e3_cosine_neardup" -> e3CosineNearDup,
  )

  val oracles: Map[String, String] = Map(
    "e3_cosine_topk" ->
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM n q, n c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
        |r AS (
        |  SELECT q_id, c_id, cos,
        |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk
        |  FROM p)
        |SELECT q_id, rnk, c_id, round(cos, 6) AS sim FROM r
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "e3_ann_recall" ->
      "SELECT true AS recall_ok, true AS cand_frac_ok",
    "e3_cosine_neardup" ->
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
        |FROM n a, n b
        |WHERE a.vec_id < b.vec_id
        |  AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.45
        |ORDER BY a, b""".stripMargin,
  )
}
