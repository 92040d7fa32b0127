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
}
