package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("trainLogistic learns a separable rule and loss decreases") {
    // y = 1 iff feature > 0; x = [bias, feature]
    val labeled = (-20 to 20).filter(_ != 0).map { f =>
      (Seq(1.0, f.toDouble), if (f > 0) 1.0 else 0.0)
    }.toDF("x", "y")
    val (w, losses) = QualityModel.trainLogistic(labeled, dim = 2,
      iters = 50, lr = 1.0)
    assert(losses.last < 0.3 * losses.head,
      s"loss ${losses.head} -> ${losses.last}")
    assert(w(1) > 0, s"feature weight must be positive, got $w")
    // every point classified correctly at 0.5
    val preds = labeled.select(
      (lit(1.0) / (lit(1.0) +
        exp(-graft.functions.VecDot.vecDot($"x", typedlit(w)))) >= 0.5)
        .as("p"), ($"y" === 1.0).as("t"))
      .as[(Boolean, Boolean)].collect()
    assert(preds.forall { case (p, t) => p == t })
  }

  test("trainLogisticNewton matches the first-order MLE in a fraction " +
      "of the rounds") {
    // NON-separable noisy logistic data (separable data has no finite
    // MLE for either trainer): y flips near the boundary
    val labeled = (-20 to 20).map { f =>
      val noisy = if (f == 1 || f == -1) f < 0 else f > 0
      (Seq(1.0, f / 10.0), if (noisy) 1.0 else 0.0)
    }.toDF("x", "y")
    val (wN, lossesN) = QualityModel.trainLogisticNewton(
      labeled, dim = 2, iters = 6)
    val (wG, lossesG) = QualityModel.trainLogistic(
      labeled, dim = 2, iters = 60, lr = 1.0)
    // Newton's 6 rounds reach at-or-below first-order's 60-round loss
    assert(lossesN.last <= lossesG.last + 1e-6,
      s"newton ${lossesN.last} vs gd ${lossesG.last}")
    assert(lossesN.last < 0.8 * lossesN.head, s"no descent: $lossesN")
    // same direction (GD at 60 rounds is still far from the MLE —
    // which is exactly why the Platt refit moved to Newton)
    assert(wN.zip(wG).forall { case (a, b) => a.sign == b.sign },
      s"newton $wN vs gd $wG")
    assert(wN(1) > 0, s"slope must be positive, got $wN")
  }

  test("trainLogisticNewton stays finite and monotone on perfectly " +
      "separable data (unbounded MLE, near-singular Hessian)") {
    // The advisor's fragility case: a future classifier that perfectly
    // separates the Platt holdout. Undamped Newton with a fixed 1e-9
    // ridge takes one g/ridge step and explodes; the backtracking line
    // search must keep every iterate finite and the loss non-increasing.
    val labeled = (-20 to 20).filter(_ != 0).map { f =>
      (Seq(1.0, f.toDouble), if (f > 0) 1.0 else 0.0)
    }.toDF("x", "y")
    val (w, losses) = QualityModel.trainLogisticNewton(
      labeled, dim = 2, iters = 8)
    assert(w.forall(v => java.lang.Double.isFinite(v)),
      s"weights exploded: $w")
    assert(w.forall(v => math.abs(v) < 1e4), s"weights unreasonable: $w")
    losses.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-12, s"loss ascent: $losses")
      case _ => ()
    }
    assert(w(1) > 0, s"slope must still point the right way: $w")
  }

  test("training is deterministic across partitionings up to FP noise") {
    val labeled = (1 to 200).map { i =>
      (Seq(1.0, (i % 7).toDouble, (i % 3).toDouble),
        if (i % 7 >= 4) 1.0 else 0.0)
    }.toDF("x", "y")
    val (w1, _) = QualityModel.trainLogistic(labeled, 3, 10, 0.5)
    val (w2, _) = QualityModel.trainLogistic(labeled.repartition(13), 3, 10, 0.5)
    w1.zip(w2).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"$w1 vs $w2")
    }
  }

  test("hashedNgramFeatures: binary-presence sparse grams plus a bias row") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val dim = 64
    val rows = QualityModel.hashedNgramFeatures(docs, "doc_id", "text", dim)
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    val bias = rows.filter(_._1 == dim).toSeq
    assert(bias == Seq((dim, 1.0)), s"bias rows: $bias")
    val feat = rows.filter(_._1 != dim)
    // distinct grams of "a b a": a, b, "a b", "b a" — ≤ 4 buckets
    // (hash collisions can only merge), each present exactly once
    assert(feat.nonEmpty && feat.length <= 4, s"buckets: ${feat.toSeq}")
    assert(feat.forall(_._2 == 1.0), s"presence must be 1.0: ${feat.toSeq}")
    assert(feat.map(_._1).distinct.length == feat.length,
      "bucket ids must be deduplicated per doc")
  }

  test("sparse hashed trainer learns a token rule that generalizes to " +
      "a held-out split") {
    val docs = (1 to 150).map { i =>
      val tail = if (i % 3 == 0) s"spamword extra$i" else s"cleanword extra$i"
      (i.toLong, s"common words appear here $tail")
    }.toDF("doc_id", "text")
    val dim = 1 << 10
    val feats = QualityModel.hashedNgramFeatures(docs, "doc_id", "text", dim)
      .localCheckpoint(eager = false)
    val labels = docs.select($"doc_id",
      when($"doc_id" % 3 === 0, 1.0).otherwise(0.0).as("y"))
    val isTest = $"doc_id" % 5 === 0
    val (w, losses) = QualityModel.trainLogisticSparse(
      feats.filter(!isTest), labels.filter(!isTest), dim,
      iters = 15, lr = 5.0)
    assert(losses.last < 0.7 * losses.head,
      s"loss ${losses.head} -> ${losses.last}")
    val acc = QualityModel.scoreSparse(feats.filter(isTest), w)
      .join(labels, Seq("doc_id"))
      .select(avg(when(($"p" >= 0.5) === ($"y" === 1.0), 1.0)
        .otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.9, s"held-out accuracy $acc")
  }

  test("dfCapFeatures drops ubiquitous buckets, keeps rare ones and " +
      "the bias") {
    val docs = (1 to 20).map { i =>
      (i.toLong, s"everywhere rare$i")
    }.toDF("doc_id", "text")
    val dim = 1 << 10
    val feats = QualityModel.hashedNgramFeatures(docs, "doc_id", "text", dim)
    val capped = QualityModel.dfCapFeatures(feats, dim)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // bias survives for every doc
    assert(capped.count(_._2 == dim) == 20, "bias rows must survive")
    // "everywhere" (df = 20 > 10) and its bigrams are gone; each doc
    // keeps its rare unigram + bigram buckets (df = 1)
    val everywhereIdx = feats.filter($"doc_id" === 1L).collect()
      .map(_.getInt(1)).toSet
    val perDoc = capped.filter(_._2 != dim).groupBy(_._1)
    assert(perDoc.nonEmpty && perDoc.values.forall(v =>
      v.length >= 1 && v.length <= 3),
      s"each doc keeps only its rare grams: ${perDoc.view.mapValues(_.length).toMap}")
  }

  test("sparse softmax learns a 3-class token rule (monotone loss, " +
      "held-out generalization, one job per step)") {
    // class k docs carry marker `classtok$k`; shared body words are
    // the conditioning hazard dfCapFeatures removes
    val docs = (1 to 150).map { i =>
      val k = i % 3
      (i.toLong, s"common shared body words classtok$k extra$i")
    }.toDF("doc_id", "text")
    val dim = 1 << 10
    val feats = QualityModel.dfCapFeatures(
      QualityModel.hashedNgramFeatures(docs, "doc_id", "text", dim), dim)
      .localCheckpoint(eager = false)
    val labels = docs.select($"doc_id",
      ($"doc_id" % 3).cast("int").as("y"))
    val isTest = $"doc_id" % 5 === 0
    val (w, losses) = QualityModel.trainSoftmaxSparse(
      feats.filter(!isTest), labels.filter(!isTest), dim,
      nClasses = 3, iters = 8, lr = 5.0)
    // monotone (the backtracking guarantee) and converging
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-12, s"loss must be monotone: $losses")
    }
    assert(losses.last < 0.7 * losses.head,
      s"loss ${losses.head} -> ${losses.last}")
    val acc = QualityModel.scoreSoftmaxSparse(feats, w)
      .join(labels, Seq("doc_id")).filter(isTest)
      .select(avg(when($"pred" === $"y", 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.95, s"held-out accuracy $acc")
  }

  test("sparse training is deterministic across partitionings up to " +
      "FP noise") {
    val docs = (1 to 60).map { i =>
      (i.toLong, s"tok${i % 5} tok${i % 7} shared words ${i % 2}")
    }.toDF("doc_id", "text")
    val dim = 256
    val labels = docs.select($"doc_id",
      when($"doc_id" % 2 === 0, 1.0).otherwise(0.0).as("y"))
    val f1 = QualityModel.hashedNgramFeatures(docs, "doc_id", "text", dim)
    val f2 = QualityModel.hashedNgramFeatures(
      docs.repartition(13), "doc_id", "text", dim).repartition(7)
    val (w1, _) = QualityModel.trainLogisticSparse(f1, labels, dim, 5, 1.0)
    val (w2, _) = QualityModel.trainLogisticSparse(f2, labels, dim, 5, 1.0)
    w1.zip(w2).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"weight drift: $a vs $b")
    }
  }
}
