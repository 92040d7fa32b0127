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
  * scores. The scale path is a compressed-signature scan (256 random-
  * projection sign bits per vector, 16× smaller than the raw floats):
  * map-side Hamming filter against broadcast query signatures, absolute
  * per-query candidate budget, exact refinement on candidates only.
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

  /** 256-bit binary signature: 4 × 64 hyperplane sign bits (seeds fixed
    * so corpus and queries agree without any shared state). */
  private def withSig(df: DataFrame, v: Column): DataFrame =
    (0 until 4).foldLeft(df) { (d, i) =>
      d.withColumn(s"_s$i", hyperplaneSignature(v, 64, seed = 2000 + i))
    }

  /** E3b: ANN candidates via compressed-signature scan with an ABSOLUTE
    * per-query budget. Each vector is compressed map-side to a 256-bit
    * hyperplane signature (32 bytes, vs 512 bytes of raw floats);
    * P(bit differs) = θ/π, so signature Hamming is a monotone estimator
    * of angle. The (small) query set's signatures are broadcast; the
    * corpus is scanned map-side, keeping only pairs within Hamming ≤ tau
    * (2.1% of random pairs at tau=112) — the corpus NEVER shuffles and
    * only τ-survivors reach the per-query top-`budget` rank, which caps
    * candidates at exactly budget·|queries| regardless of corpus size.
    * Exact refinement then runs on candidates only. Measured on the
    * synthetic embeddings (top-5 cosine ≈ 0.33-0.38 vs noise ≈ 0 — a
    * deliberately hard, weakly-clustered corpus): recall of the exact
    * top-5 ≈ 0.91 at both sf0.01 and sf0.1.
    *
    * (The previous design — multi-table bucket LSH at 6 bits/table —
    * admitted ~27% of all pairs; 16-24-bit buckets fix the volume but
    * measured recall falls below 0.35 on this corpus: with p₁ ≈ 0.6 the
    * per-bit gap is too small for exact-bucket matching. The ranked
    * compressed scan is the shape PQ/SQ systems use at this operating
    * point.) Returns (q_id, c_id, hamming). */
  def annCandidates(corpus: DataFrame, queries: DataFrame,
      budget: Int = 150, tau: Int = 112): DataFrame = {
    val c = withSig(corpus.select(col("vec_id").as("c_id"),
      asDouble(col("embedding")).as("cv")), col("cv"))
      .select(col("c_id"), col("_s0").as("c0"), col("_s1").as("c1"),
        col("_s2").as("c2"), col("_s3").as("c3"))
    val q = withSig(queries.select(col("vec_id").as("q_id"),
      asDouble(col("embedding")).as("qv")), col("qv"))
      .select(col("q_id"), col("_s0").as("q0"), col("_s1").as("q1"),
        col("_s2").as("q2"), col("_s3").as("q3"))
    val hd = bit_count(col("q0").bitwiseXOR(col("c0"))) +
      bit_count(col("q1").bitwiseXOR(col("c1"))) +
      bit_count(col("q2").bitwiseXOR(col("c2"))) +
      bit_count(col("q3").bitwiseXOR(col("c3")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("hamming"), col("c_id"))
    c.join(broadcast(q), col("q_id") =!= col("c_id") && hd <= tau)
      .withColumn("hamming", hd)
      .withColumn("_rnk", row_number().over(w))
      .filter(col("_rnk") <= budget)
      .select(col("q_id"), col("c_id"), col("hamming"))
  }

  // ------------------------------------------------------------ queries

  /** E3: exact cosine top-5 for the first 5 vectors, against the full
    * corpus — DuckDB recomputes it from the same parquet. */
  private val e3CosineTopk: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** E3b: ANN self-check — candidate recall of the exact top-5 must
    * clear 0.5 (measured ≈ 0.91 at both gate SFs), while candidate
    * volume respects the ABSOLUTE per-query budget (≤ 150 per query =
    * 30·k, independent of corpus size — not a fraction of n²). Emits
    * two booleans for the constant oracle. */
  private val e3AnnRecall: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val exact = bruteForceTopK(emb.filter(col("vec_id") < 50), emb, k = 5)
      .select(col("q_id"), col("c_id"))
    val cand = annCandidates(emb, emb.filter(col("vec_id") < 50),
      budget = 150, tau = 112).localCheckpoint()
    // All scalars in ONE returned plan (no driver-side actions); the
    // exact top-k subtree is shared between total and hits.
    val hitsAgg = exact.join(cand.select(col("q_id"), col("c_id")),
        Seq("q_id", "c_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val candAgg = cand.groupBy(col("q_id"))
      .agg(count(lit(1)).as("per_q"))
      .agg(max(col("per_q")).as("max_per_q"))
    hitsAgg.crossJoin(totalAgg).crossJoin(candAgg).select(
      (col("hits").cast("double") / col("total") >= 0.5).as("recall_ok"),
      (col("max_per_q") <= 150).as("cand_budget_ok"))
  }

  /** Production near-dup path: candidates from the compressed-signature
    * scan, exact cosine refinement on candidates only — never an
    * all-pairs cosine. Returns (a, b, sim) with a < b, sim ≥ threshold.
    * EXACT refinement touches ≤ budget·n pairs; the τ-filter stage
    * before the cap still passes ~2% of (narrow id+hamming) pairs and
    * the corpus signature set is broadcast, so this single-call shape is
    * for corpora whose 32-byte signatures fit a broadcast (~10⁷
    * vectors). Beyond that, run it query-batched: stream corpus slices
    * through `annCandidates(corpus, slice, ...)` — same plan per batch,
    * broadcast is per-slice, and the refinement bound is unchanged. */
  def cosineNearDupViaAnn(vecs: DataFrame, threshold: Double,
      budget: Int = 150, tau: Int = 112): DataFrame = {
    val v = vecs.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    // Canonicalize then dedup: a pair found in only ONE orientation
    // (budget truncation can drop b from a's top-`budget` while a
    // survives b's) still gets refined exactly once.
    val cand = annCandidates(vecs, vecs, budget, tau)
      .select(least(col("q_id"), col("c_id")).as("a"),
        greatest(col("q_id"), col("c_id")).as("b"))
      .distinct()
    cand
      .join(v.as("va"), col("a") === col("va.vec_id"))
      .join(v.as("vb"), col("b") === col("vb.vec_id"))
      .withColumn("cos",
        dot(col("va.v"), col("vb.v")) / (col("va.nrm") * col("vb.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("sim"))
  }

  /** E3c: embedding-cosine near-duplicate pairs — exact all-pairs here
    * as the verification harness (the DuckDB oracle recomputes the same
    * cross product); the production path is `cosineNearDupViaAnn`,
    * whose recall against this exact result is spec-tested.
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
      "SELECT true AS recall_ok, true AS cand_budget_ok",
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
