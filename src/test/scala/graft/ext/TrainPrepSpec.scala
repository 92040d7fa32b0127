package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  test("temperatureMixturePlan: α flattens shares; epochs track budget/avail") {
    // two sources, 9:1 token ratio ("a b c" = 3 tokens per doc)
    val docs = (Seq.fill(9)("big") ++ Seq("small")).zipWithIndex
      .map { case (src, i) => (i.toLong, src, "a b c") }
      .toDF("doc_id", "source", "text")
    val plan = TrainPrep.temperatureMixturePlan(docs, "source", "text",
      alpha = 0.3, budgetX = 8.0)
      .select($"source", $"avail_tokens", $"share", $"epochs",
        $"beyond_free_repetition")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(plan("big")._1 == 27L && plan("small")._1 == 3L)
    // α = 0.3 flattens 0.9/0.1 to 0.9^0.3 / (0.9^0.3 + 0.1^0.3)
    val wB = math.pow(0.9, 0.3); val wS = math.pow(0.1, 0.3)
    assert(math.abs(plan("big")._2 - wB / (wB + wS)) < 1e-6)
    assert(math.abs(plan("small")._2 - wS / (wB + wS)) < 1e-6)
    // small is upweighted past the 4-epoch regime at 8x budget, big not:
    // epochs_small = 8 * 30 * share_small / 3 ≈ 27.5; epochs_big ≈ 5.8
    assert(plan("small")._4 && plan("small")._3 > 4.0)
    assert(plan("big")._3 < plan("small")._3)
    // shares sum to ~1
    assert(math.abs(plan("big")._2 + plan("small")._2 - 1.0) < 1e-5)
  }

  test("leakSafeSplit: a near-dup chain lands whole; singletons match hashSplit") {
    // chain 1~2, 2~3 (transitive: {1,2,3} one cluster); 4 and 5 singletons
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val fracs = Seq("train" -> 0.5, "test" -> 0.5)
    val out = TrainPrep.leakSafeSplit(docs, "doc_id", pairs, fracs)
      .as[(Long, Long, String)].collect()
      .map { case (id, rep, sp) => id -> (rep, sp) }.toMap
    // whole cluster shares the min-id representative and ONE split
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct.size == 1)
    // singletons are their own rep and degrade to the plain hash split
    val plain = TrainPrep.hashSplit(docs, "doc_id", fracs)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    for (id <- Seq(4L, 5L)) {
      assert(out(id)._1 == id)
      assert(out(id)._2 == plain(id))
    }
    // the clustered docs take the REPRESENTATIVE's plain label
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct == Seq(plain(1L)))
  }

  test("ccnetBuckets: terciles are per-language, ordered, and balanced") {
    // lang x: six docs on a sharply Zipfian vocabulary — docs of common
    // words score low (head), docs of rare words high (tail). lang y:
    // three docs, its own independent tercile split.
    val docs = Seq(
      ("x1", "x", "a a a a"), ("x2", "x", "a a a b"),
      ("x3", "x", "a a b b"), ("x4", "x", "a b b c"),
      ("x5", "x", "b b c c"), ("x6", "x", "c c d d"),
      ("y1", "y", "a a"), ("y2", "y", "a c"), ("y3", "y", "d e"))
      .toDF("doc_id", "lang", "text")
    val out = TrainPrep.ccnetBuckets(docs)
      .select($"lang", $"bucket", $"n_docs", $"min_score", $"max_score")
      .as[(String, Int, Long, Double, Double)].collect().toSeq
    val x = out.filter(_._1 == "x").sortBy(_._2)
    val y = out.filter(_._1 == "y").sortBy(_._2)
    assert(x.map(_._3) == Seq(2L, 2L, 2L), "6 docs split 2/2/2")
    assert(y.map(_._3) == Seq(1L, 1L, 1L), "3 docs split 1/1/1")
    // tercile boundaries are ordered: head's max <= middle's min, etc.
    for (Seq(lo, hi) <- x.sliding(2) ++ y.sliding(2))
      assert(lo._5 <= hi._4,
        s"bucket ${lo._2} max ${lo._5} > bucket ${hi._2} min ${hi._4}")
    // languages do not share boundaries: y's head is y's own lowest doc
    assert(y.head._4 == y.head._5, "singleton bucket min == max")
  }

  test("hashSplit is deterministic, exhaustive, and near the requested fractions") {
    val docs = Tables.load(spark, sf, "documents")
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = TrainPrep.hashSplit(docs, "doc_id", fracs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = TrainPrep.hashSplit(docs, "doc_id", fracs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "split must be reproducible run to run")
    val n = docs.count().toDouble
    assert(a.values.sum == n.toLong, "every row gets exactly one split")
    // multiplicative hashing is uniform enough that 80% ± 15pp holds
    // even on 50 ids (sf0.001)
    assert(math.abs(a.getOrElse("train", 0L) / n - 0.8) < 0.15,
      s"train fraction off: $a")
  }

  test("packing: every bin's documents start inside the bin's token range") {
    val packed = TrainPrep.packByTokenBudget(
      Tables.load(spark, sf, "documents"), "lang", "doc_id", "text", 2048)
      .withColumn("start", col("cum") - col("toks"))
    val bad = packed.filter(
      col("start") < col("bin") * 2048 ||
        col("start") >= (col("bin") + 1) * 2048)
    assert(bad.count() == 0, "bin must equal floor(startOffset / budget)")
    // bins are contiguous from 0 within each lang
    val gaps = packed.groupBy("lang").agg(
      max(col("bin")).as("mx"), countDistinct(col("bin")).as("nb"))
      .filter(col("nb") =!= col("mx") + 1)
    assert(gaps.count() == 0, "bin ids must be contiguous per shard")
  }

  test("contamination flags a planted duplicate and clears an unrelated doc") {
    val mk = (id: Int, text: String) => (id.toLong, text)
    val trainText = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      mk(50, trainText),                       // holdout: exact dup of 1
      mk(100, "completely different words about spark catalyst optimizers"),
      mk(1, trainText),                        // train partner
      mk(2, "unrelated filler content entirely made of other phrases okay"))
      .toDF("doc_id", "text")
    val got = TrainPrep.contamination(docs, "doc_id", "text",
      holdoutMod = 50, maxDf = 100, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.length == 2, s"holdout should be exactly ids 50 and 100: ${got.toSeq}")
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(50)._2 == 1.0 && byId(50)._3 == 1L,
      s"planted dup must hit containment 1.0: ${got.toSeq}")
    assert(byId(100)._2 == 0.0 && byId(100)._3 == 0L,
      s"unrelated doc must be clean: ${got.toSeq}")
  }

  test("mixtureRates: uniform targets on a uniform corpus keep everything") {
    val df = (0L until 100L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val rates = TrainPrep.mixtureRates(df, "source", lit(1.0))
      .select($"source", $"rate").as[(String, Double)].collect().toMap
    assert(rates.size == 4 && rates.values.forall(r => math.abs(r - 1.0) < 1e-9))
    assert(TrainPrep.applyMixture(df, "id", "source", lit(1.0)).count() == 100)
  }

  test("mixture rebalance hits the target proportions via the binding source") {
    // 80 rows of a, 20 of b; target 1:1 → b binds (keeps all 20),
    // a's rate = (0.5·40)/80 = 0.25 → ~20 kept.
    val df = ((0L until 80L).map(i => (i, "a")) ++
      (100L until 120L).map(i => (i, "b"))).toDF("id", "source")
    val rates = TrainPrep.mixtureRates(df, "source", lit(1.0))
      .select($"source", $"rate").as[(String, Double)].collect().toMap
    assert(math.abs(rates("b") - 1.0) < 1e-9, s"binding source keeps all: $rates")
    assert(math.abs(rates("a") - 0.25) < 1e-9, s"a downsamples 4:1: $rates")
    val kept = TrainPrep.applyMixture(df, "id", "source", lit(1.0))
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(kept("b") == 20L)
    // deterministic hash sampling at rate .25 over 80 uniform-hash ids
    assert(kept("a") >= 10L && kept("a") <= 30L, s"got $kept")
  }

  test("weightedSample with k >= n keeps every row") {
    val df = (1L to 5L).map(i => (i, "x")).toDF("id", "source")
    assert(TrainPrep.weightedSample(df, "id", lit(1.0), 10).count() == 5)
  }

  test("weightedSample with equal weights is top-k by the hash uniform") {
    // golden-ratio hash of 1..10: ids 8 (.944), 3 (.854), 6 (.708)
    // carry the three largest uniforms.
    val df = (1L to 10L).map(i => (i, "x")).toDF("id", "source")
    val got = TrainPrep.weightedSample(df, "id", lit(1.0), 3)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(8L, 3L, 6L), s"got $got")
  }

  test("weightedSample favors the heavy row over every light uniform") {
    // id 5 has the SMALLEST uniform (.090) but weight 1000 lifts its
    // key to .090^.001 ≈ .9976, above the best light key (.944): A-ES
    // inclusion follows weight, not raw hash luck.
    val df = (1L to 10L).map(i => (i, "x")).toDF("id", "source")
    val heavy = when($"id" === 5L, 1000.0).otherwise(1.0)
    val got = TrainPrep.weightedSample(df, "id", heavy, 1)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(5L), s"got $got")
    val unweighted = TrainPrep.weightedSample(df, "id", lit(1.0), 3)
      .select($"id").as[Long].collect().toSet
    assert(!unweighted.contains(5L), "without weight, id 5 is nowhere near top-3")
  }

  test("shuffleShards is a deterministic permutation with dense per-shard positions") {
    val df = (1L to 100L).map(i => (i, s"d$i")).toDF("id", "payload")
    val a = TrainPrep.shuffleShards(df, "id", 8).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).sortBy(_._1)
    val b = TrainPrep.shuffleShards(df, "id", 8).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).sortBy(_._1)
    assert(a.sameElements(b), "shuffle must reproduce run to run")
    assert(a.map(_._1).distinct.length == 100, "every id exactly once")
    // positions are 1..k within each shard, no gaps, no duplicates
    a.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.sameElements(1 to rows.length),
        s"shard $shard positions not dense: ${ps.toSeq}")
    }
    // the order is NOT the identity: consecutive ids scatter to
    // different shards (the point of the multiplicative hash)
    assert(a.map(_._2).distinct.length == 8, "all shards populated")
    val idOrderPreserved = a.filter(_._2 == a.head._2).map(_._1)
    val posOrder = a.filter(_._2 == a.head._2).sortBy(_._3).map(_._1)
    assert(!idOrderPreserved.sameElements(posOrder) ||
      idOrderPreserved.length <= 2,
      "within-shard order should follow the hash, not the id")
  }

  test("shuffleShards shard assignment matches h mod n") {
    val df = Seq(Tuple1(7L)).toDF("id")
    val got = TrainPrep.shuffleShards(df, "id", 16)
      .select($"shard").as[Int].head()
    val h = (7L % 2147483648L) * 2654435761L % 4294967296L
    assert(got == (h % 16).toInt)
  }

  test("span-mask plan is hash-deterministic — hand case at doc_id 0") {
    // key = 0·1000 + pos; h(0) % 20 = 0 → a span starts at pos 0 and
    // covers pos 0..2; h(1), h(2) are non-starts. Over "a b c d":
    // 1 start, 3 masked, 1 span, ratio 0.75.
    val got = TrainPrep.spanMaskStats(Seq((0L, "a b c d"))
        .toDF("doc_id", "text"))
      .select($"n_tok", $"n_starts", $"n_masked", $"n_spans",
        $"mask_ratio")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got == ((4L, 1L, 3L, 1L, 0.75)), got)
  }

  test("span-mask invariants: spans cover ≤ 3 tokens, budget ≈ 15%") {
    val docs = (0L until 50L)
      .map(d => (d, Seq.fill(60)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TrainPrep.spanMaskStats(docs)
      .select($"n_starts", $"n_masked", $"n_spans", $"n_tok")
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (st, m, sp, _) =>
      assert(m <= 3 * st && sp <= st, (st, m, sp))
    }
    val ratio = rows.map(_._2).sum.toDouble / rows.map(_._4).sum
    assert(ratio > 0.10 && ratio < 0.20, s"budget drifted: $ratio")
  }

  test("length batching: sorted batches waste less padding — hand case") {
    // lengths by arrival: 1, 10, 2, 20; batchSize 2.
    //   arrival: (1,10) waste 2·10−11 = 9; (2,20) waste 2·20−22 = 18 → 27
    //   sorted:  (1,2)  waste 2·2−3  = 1; (10,20) waste 2·20−30 = 10 → 11
    val docs = Seq(
      (1L, "w"), (2L, Seq.fill(10)("w").mkString(" ")),
      (3L, "w w"), (4L, Seq.fill(20)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TrainPrep.lengthBatchingRollup(docs, batchSize = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("arrival", 2L, 33L, 27L), ("sorted", 2L, 33L, 11L)),
      got)
  }

  test("curriculum interleaves buckets round-robin, easiest first") {
    // 8 docs, difficulty = n_chars/words = n_chars (one word each):
    // doc i has difficulty i → buckets {1,2}{3,4}{5,6}{7,8} (ntile 4
    // over 8 rows), rn 1..2 within each. Schedule: rn=1 sweep across
    // buckets (docs 1,3,5,7) then rn=2 sweep (2,4,6,8).
    val docs = (1 to 8).map(i => (i.toLong, "w", i.toLong))
      .toDF("doc_id", "text", "n_chars")
    val got = TrainPrep.curriculumSchedule(docs, nBuckets = 4, limit = 8)
      .select($"pos", $"doc_id", $"bucket", $"rn")
      .as[(Int, Long, Int, Int)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 5L, 7L, 2L, 4L, 6L, 8L), got)
    assert(got.map(_._3) == Seq(1, 2, 3, 4, 1, 2, 3, 4), got)
    assert(got.map(_._4) == Seq(1, 1, 1, 1, 2, 2, 2, 2), got)
  }
}
