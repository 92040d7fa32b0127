package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Trainable quality classifier (EXT, SURVEY §2.12; no reference
  * analog) — the fastText-style linear filter every web-corpus pipeline
  * trains to score documents, expressed as distributed batch gradient
  * descent on the engine itself:
  *
  *   - features are map-only column expressions packed into a small
  *     `array<double>` (bias, banned-term count, stopword ratio,
  *     log-length) — the classic cheap quality signals;
  *   - one training iteration = ONE global aggregation producing the
  *     d-dimensional gradient (σ(w·x) − y)·x summed with partial aggs;
  *     only d doubles reach the driver per step, like IVF training;
  *   - the model is d literal doubles shipped back into the scoring
  *     plan — inference is map-only, codegen'd, zero shuffle.
  *
  * At 100 TB each step is one linear scan (or a deterministic hash
  * sample of it); the driver never holds data, only the weight vector.
  */
object QualityModel {

  type Q = (SparkSession, String) => DataFrame

  /** Feature vector: [bias, banned-term count, stopword ratio,
    * ln(1+len)/10]. Shares [[Hygiene.BannedTermRe]] so the planted-spam
    * rule is learnable. */
  def features(text: Column): Column = array(
    lit(1.0),
    regexp_count(text, lit(Hygiene.BannedTermRe)).cast("double"),
    TextStats.stopwordRatio(text),
    log(lit(1.0) + length(text)) / 10.0)

  private def dot(x: Column, w: Seq[Double]): Column =
    graft.functions.VecDot.vecDot(x, typedlit(w))

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Batch-gradient logistic regression. `labeled` needs `x:
    * array<double>` and `y: double`; returns (weights, per-iteration
    * mean log-loss). One aggregation job per step; gradient and loss
    * come back together so convergence is observable for free. */
  def trainLogistic(labeled: DataFrame, dim: Int, iters: Int,
      lr: Double): (Seq[Double], Seq[Double]) = {
    var w: Seq[Double] = Seq.fill(dim)(0.0)
    val losses = (0 until iters).map { _ =>
      val p = sigmoid(dot(col("x"), w))
      val gradCols = (0 until dim).map(i =>
        avg((p - col("y")) * element_at(col("x"), i + 1)).as(s"g$i"))
      val eps = 1e-12 // clamp log-loss away from ln(0)
      val lossCol = avg(-(col("y") * log(greatest(p, lit(eps))) +
        (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(eps)))))
        .as("loss")
      val row = labeled.agg(gradCols.head, gradCols.tail :+ lossCol: _*)
        .head()
      w = w.zipWithIndex.map { case (wi, i) => wi - lr * row.getDouble(i) }
      row.getDouble(dim)
    }
    (w, losses)
  }

  /** Score with a trained model — map-only, model as literals. */
  def score(df: DataFrame, textCol: String, w: Seq[Double]): Column =
    sigmoid(dot(features(col(textCol)), w))

  // ------------------------------------------------------------ queries

  /** E10 ✱: train on the planted-spam corpus (label = doc carries a
    * planted banned term), then assert IN-PLAN over the full corpus:
    * training loss dropped by ≥ 30%, classification accuracy at 0.5 ≥
    * 0.95, and scores are proper probabilities — vs a constant-true
    * oracle. A broken gradient, a wrong sigmoid, or a feature/label
    * leak all fail the gate. */
  private val e10QualityLr: Q = (s, dir) => {
    val docs = Hygiene.withPlantedSpam(Tables.load(s, dir, "documents"))
    val labeled = docs.select(
      features(col("text")).as("x"),
      when(col("doc_id") % 9 === 0 || col("doc_id") % 17 === 0, 1.0)
        .otherwise(0.0).as("y"))
      .localCheckpoint(eager = false) // 30 scans of a tiny projection
    val (w, losses) = trainLogistic(labeled, dim = 4, iters = 30, lr = 1.0)
    val p = sigmoid(dot(col("x"), w))
    labeled.agg(
      avg(when((p >= 0.5) === (col("y") === 1.0), 1.0).otherwise(0.0))
        .as("acc"),
      min(p).as("pmin"), max(p).as("pmax"), count(lit(1)).as("n"))
      .select(
        (col("acc") >= 0.95).as("accurate"),
        lit(losses.last <= 0.7 * losses.head).as("loss_dropped"),
        (col("pmin") >= 0.0 && col("pmax") <= 1.0).as("proper_probs"),
        (col("n") > 0).as("nonempty"))
  }

  val queries: Map[String, Q] = Map(
    "e10_quality_lr" -> e10QualityLr,
  )

  val oracles: Map[String, String] = Map(
    "e10_quality_lr" ->
      """SELECT true AS accurate, true AS loss_dropped,
        |  true AS proper_probs, true AS nonempty""".stripMargin,
  )
}
