package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import scala.jdk.CollectionConverters._

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

  /** Native codegen'd dot product — see [[graft.functions.VecDot]];
    * the interpreted HOF spelling was the hot-path cost of every
    * similarity query (~10× slower on this corpus). */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.vecDot(a, b)

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

  // ------------------------------------------------------------ IVF

  /** Unit-normalize a double-array vector (zero vectors pass through,
    * so downstream dot products are 0, never NaN). */
  private def unitNorm(v: Column): Column = {
    val nrm = sqrt(dot(v, v))
    when(nrm > 0, transform(v, x => x / nrm)).otherwise(v)
  }

  // Centroid-table scoring is native since r15 — see
  // graft.functions.Centroids (one reference object + one compiled
  // loop; the old array(struct(vec_dot(uv, lit(c)), id)...) spelling
  // planned C dot nodes + C literal arrays per job and its codegen
  // dominated every training action at C ≈ 257 seeding candidates).

  /** IVF coarse-quantizer training: k-means||-style SEEDING (Bahmani
    * et al., VLDB'12) refined by `iters` Lloyd iterations. The old
    * lowest-id seed was data-ORDER dependent — if low ids happen to
    * cluster (one crawl shard, one dense region), every seed lands in
    * one region and Lloyd cannot separate what the seeds never span
    * (empty cells keep their near-duplicate initials; a spec pins the
    * collapse). k-means|| fixes that with cost-proportional
    * oversampling, derandomized here per the repo's no-RNG convention:
    * each round every vector is selected iff a fixed xxhash64 of its
    * id and the round salt, mapped to [0,1), falls under
    * ℓ·cost/total_cost — cost being the vector's cosine distance to
    * its nearest current seed, computed map-side against broadcast
    * literals, with total_cost rounded to the 8-decimal grid so the
    * threshold is partition-independent. After R rounds the ~ℓ·R
    * candidates (bounded driver traffic, like the centroid tables) are
    * weighted by the mass they attract (one aggregation) and reduced
    * to `c` seeds by deterministic weighted farthest-first traversal
    * on the driver. Lloyd then runs as before: map-side argmax
    * assignment, element-wise posexplode+avg update (C·dim rows to
    * the driver, never vectors), means rounded to the fixed 8-decimal
    * grid IN-PLAN so the trained centroids — and hence every
    * downstream cell assignment and gated recall — are independent of
    * partitioning. At cluster scale training runs on a sample; the
    * result is C·dim doubles — kilobytes — shipped into plans as
    * literals. */
  def ivfTrain(vecs: DataFrame, c: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    val uv = vecs.select(col("vec_id"),
      unitNorm(asDouble(col("embedding"))).as("uv"))
      .localCheckpoint(eager = false) // read every seeding + Lloyd round
    // deterministic "uniform" in [0,1): top 53 bits of xxhash64(id, salt)
    def unif(salt: Int): Column =
      shiftrightunsigned(xxhash64(col("vec_id"), lit(salt)), 11)
        .cast("double") / lit(9007199254740992.0) // 2^53
    // first seed: the id whose hash is minimal — "random", not data-order
    var seeds: Seq[Seq[Double]] = Seq(
      uv.orderBy(xxhash64(col("vec_id"), lit(0)), col("vec_id")).limit(1)
        .select(col("uv")).collect().head.getSeq[Double](0))
    val oversample = 2 * c
    for (r <- 1 to 4) {
      val cost = lit(1.0) -
        graft.functions.Centroids.centroidBest(col("uv"),
          seeds.zipWithIndex.map(_.swap)).getField("d")
      val withCost = uv.withColumn("cost", cost)
        .localCheckpoint(eager = false) // total agg + the probe side
      // ONE action per seeding round instead of two (r14, guide §1/§5:
      // the driver loop's job count IS the cost on small inputs): the
      // round's total cost rides the plan as a broadcast one-row agg —
      // same round(·,8) value, same `total > 0` guard, same row order
      // (the broadcast join preserves streamed-side order) — so the
      // picked seed set is bit-identical to the two-action version.
      val total = withCost.agg(round(sum(col("cost")), 8).as("total"))
      val picked = withCost
        .crossJoin(broadcast(total))
        .filter(col("total") > 0 &&
          unif(r) * col("total") < lit(oversample.toDouble) * col("cost"))
        .select(col("uv")).collect().map(_.getSeq[Double](0)).toSeq
      seeds = (seeds ++ picked).distinct
    }
    // weight candidates by attracted mass, then reduce to c seeds by
    // weighted farthest-first (pure driver arithmetic on ≤ ~8c+1 rows)
    val cand = seeds.zipWithIndex.map(_.swap)
    val weights = uv.select(
        graft.functions.Centroids.centroidBest(col("uv"), cand)
          .getField("cell").as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      1.0 - a.zip(b).map { case (x, y) => x * y }.sum
    val first = cand.maxBy(s => (weights.getOrElse(s._1, 0L), -s._1))._2
    val chosen = scala.collection.mutable.ArrayBuffer(first)
    while (chosen.length < c && chosen.length < cand.length) {
      val next = cand.maxBy { case (id, v) =>
        val dmin = chosen.map(d2(v, _)).min
        (weights.getOrElse(id, 0L) * dmin, -id) // deterministic tie-break
      }._2
      chosen += next
    }
    // degenerate corpora (< c distinct candidates): pad by repeating
    // the first seed — Lloyd's empty-cell rule keeps the pads harmless
    while (chosen.length < c) chosen += chosen.head
    var cents: Seq[(Int, Seq[Double])] =
      chosen.toSeq.zipWithIndex.map(_.swap)
    for (_ <- 0 until iters) {
      val assigned = uv.select(
        graft.functions.Centroids.centroidBest(col("uv"), cents)
          .getField("cell").as("cell"),
        col("uv"))
      val means = assigned
        .select(col("cell"), posexplode(col("uv")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(avg(col("col")), 8).as("m"))
        .collect().map(r => (r.getInt(0), (r.getInt(1), r.getDouble(2))))
        .groupBy(_._1).map { case (cell, rows) =>
          val arr = rows.map(_._2).sortBy(_._1).map(_._2)
          val n = math.sqrt(arr.map(x => x * x).sum)
          (cell, (if (n > 0) arr.map(_ / n) else arr).toSeq)
        }
      // cells that captured no vectors keep their previous centroid
      cents = cents.map { case (id, old) => (id, means.getOrElse(id, old)) }
    }
    cents
  }

  /** IVF cell assignment: map-side argmax of centroid dot products
    * (ties break to the higher cell id). Returns (vec_id, cell, uv). */
  def ivfAssign(vecs: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame =
    vecs.select(col("vec_id"),
      unitNorm(asDouble(col("embedding"))).as("uv"))
      .withColumn("cell",
        graft.functions.Centroids.centroidBest(col("uv"), cents)
          .getField("cell"))

  /** Query-side probe list: each query's `nprobe` nearest cells by
    * centroid dot product, exploded to (q_id, qv, cell). */
  def ivfProbes(queries: DataFrame, cents: Seq[(Int, Seq[Double])],
      nprobe: Int): DataFrame =
    queries.select(col("vec_id").as("q_id"),
      unitNorm(asDouble(col("embedding"))).as("qv"))
      .withColumn("cell", explode(
        graft.functions.Centroids.centroidTopCells(col("qv"), cents,
          nprobe)))

  /** E3d: IVF top-k — the second ANN scale path (cell-bucketed rather
    * than compressed-scan). The corpus is assigned to cells map-side
    * and joined to the broadcast probe list on cell: per query only the
    * `nprobe` probed cells (~nprobe/C of the corpus) pay the exact
    * cosine, and each corpus vector lives in exactly one cell, so a
    * candidate appears at most once per query. At cluster scale the
    * assignment is a one-off index build (store partitioned/bucketed BY
    * cell) and search touches only the probed partitions. Measured on
    * the synthetic embeddings (C=32, nprobe=8): recall of the exact
    * top-5 ≈ 0.83-0.84 at sf0.001/0.01/0.1 scanning ≤ 25% of corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      cents: Seq[(Int, Seq[Double])], k: Int, nprobe: Int): DataFrame = {
    val c = ivfAssign(corpus, cents)
      .select(col("vec_id").as("c_id"), col("cell"), col("uv").as("cv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    c.join(broadcast(ivfProbes(queries, cents, nprobe)), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", dot(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("cos"), 6).as("sim"))
  }

  /** Persist the IVF index: corpus assigned to cells, laid out as a
    * cell-partitioned parquet table — the one-off index build the
    * in-memory path documents. At cluster scale this is the stored
    * artifact searches run against. */
  def ivfWriteIndex(corpus: DataFrame, cents: Seq[(Int, Seq[Double])],
      path: String): Unit =
    ivfAssign(corpus, cents)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Search the on-disk index. The probe list joins the index on its
    * PARTITION column, and the broadcast join triggers dynamic
    * partition pruning — unprobed cell directories are never read
    * (`PartitionFilters: [... dynamicpruningexpression(cell IN ...)]`,
    * plan-pinned in SimilaritySpec). Same ranking semantics as
    * `ivfTopK`; the gate asserts result equality. */
  def ivfSearchIndex(spark: SparkSession, path: String, queries: DataFrame,
      cents: Seq[(Int, Seq[Double])], k: Int, nprobe: Int): DataFrame = {
    val idx = spark.read.parquet(path)
      .select(col("vec_id").as("c_id"), col("uv").as("cv"), col("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    idx.join(broadcast(ivfProbes(queries, cents, nprobe)), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", dot(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("cos"), 6).as("sim"))
  }

  // ------------------------------------- IVF index deletes (e3o)

  /** Tombstone ids in a persisted cell-partitioned index (`idCol` is
    * `vec_id` for the IVF layout, `c_id` for the IVFADC coded layout)
    * — the k26 deletion-vector pattern composed with the ANN artifact:
    * a forget request costs O(ids written) into a deletes-sized
    * sidecar; the cell-partitioned base is NEVER rewritten, repeated
    * batches append, the read side de-duplicates. Before this, a
    * forget request against an embedding index meant retrain. */
  def ivfDelete(ids: DataFrame, path: String,
      idCol: String = "vec_id"): Unit =
    ids.select(col(ids.columns.head).as(idCol)).write.mode("append")
      .parquet(path + "_tombstones")

  /** Merge-on-read index scan: base minus tombstones as a BROADCAST
    * anti-join (tombstones are deletes-sized — the
    * [[graft.lake.Snapshots.readWithDeletes]] adjudication). With no
    * sidecar the plan is the plain scan, unchanged. */
  def ivfReadIndex(s: SparkSession, path: String,
      idCol: String = "vec_id"): DataFrame = {
    // A crashed compaction may have a cell moved aside but not yet
    // replaced — serving the scan would silently omit that cell's
    // rows. Fail loudly; ivfCompact's recovery path restores it.
    require(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path + "_compact_inprogress")),
      s"index at $path has an in-progress compaction marker " +
        "(crashed mid-swap?) — run ivfCompact to recover before reading")
    require(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path + "_rebalance_inprogress")),
      s"index at $path has an in-progress rebalance marker " +
        "(crashed mid-split?) — run ivfRebalance to recover before reading")
    val base = s.read.parquet(path)
    val tomb = java.nio.file.Paths.get(path + "_tombstones")
    if (!java.nio.file.Files.isDirectory(tomb)) base
    else base.join(
      broadcast(s.read.parquet(tomb.toString).distinct()),
      Seq(idCol), "left_anti")
  }

  /** Fold tombstones into the layout: rewrite ONLY the cells holding
    * deleted rows (survivors staged to a temp dir cell-partitioned,
    * then an O(affected-cells) directory swap — untouched cell dirs
    * keep their files byte-for-byte), then drop the sidecar. A fully
    * deleted cell's directory is removed outright. The staged-swap
    * shape is what a 100 TB index wants: the rewrite is partition-
    * local to the deletes' cells, never a full-index job.
    *
    * Crash safety (the Snapshots publish/claim discipline): each live
    * cell dir is moved ASIDE — never deleted — before its staged
    * replacement moves in, under an in-progress marker; the aside
    * copies, the marker, and the tombstone sidecar are dropped only
    * after ALL swaps complete. A crash at any point loses nothing:
    * either the old cell is still live, or its aside copy exists and
    * the next [[ivfCompact]] restores any cell caught between its two
    * moves before restarting from the still-present sidecar. */
  def ivfCompact(s: SparkSession, path: String,
      idCol: String = "vec_id"): Unit = {
    import java.nio.file.{Files, Paths}
    val aside = Paths.get(path + "_compact_old")
    val marker = Paths.get(path + "_compact_inprogress")
    if (Files.exists(marker)) {
      // Recover from a mid-swap crash: an aside cell missing from the
      // live tree was between its move-out and move-in — restore it.
      if (Files.isDirectory(aside)) {
        val st = Files.list(aside)
        try st.iterator().asScala.filter(Files.isDirectory(_)).foreach {
          c =>
            val dst = Paths.get(path, c.getFileName.toString)
            if (!Files.exists(dst)) Files.move(c, dst)
        } finally st.close()
      }
      graft.lake.Lake.deleteRecursively(aside.toFile)
      Files.deleteIfExists(marker)
    }
    val tombDir = Paths.get(path + "_tombstones")
    if (!Files.isDirectory(tombDir)) return
    val tombs = s.read.parquet(tombDir.toString).distinct()
    val base = s.read.parquet(path)
    val hit = base.join(broadcast(tombs), Seq(idCol), "left_semi")
      .select(col("cell")).distinct().collect().map(_.get(0)) // ≤ C cells
    if (hit.nonEmpty) {
      val tmp = path + "_compact_tmp"
      base.filter(col("cell").isin(hit: _*))
        .join(broadcast(tombs), Seq(idCol), "left_anti")
        .write.mode("overwrite").partitionBy("cell").parquet(tmp)
      Files.createDirectories(aside)
      Files.writeString(marker, hit.mkString("\n"))
      hit.foreach { c =>
        val dst = Paths.get(path, s"cell=$c")
        if (Files.exists(dst)) Files.move(dst, aside.resolve(s"cell=$c"))
        val src = Paths.get(tmp, s"cell=$c")
        if (Files.isDirectory(src)) Files.move(src, dst)
      }
      // All swaps landed — only now is the old state disposable.
      graft.lake.Lake.deleteRecursively(aside.toFile)
      Files.deleteIfExists(marker)
      graft.lake.Lake.deleteRecursively(Paths.get(tmp).toFile)
    }
    graft.lake.Lake.deleteRecursively(tombDir.toFile)
  }

  /** Split every cell holding more than `maxCellRows` vectors into two
    * sub-cells trained ONLY on that cell's vectors (local 2-means via
    * [[ivfTrain]]) — the index-MAINTENANCE step after skewed ingest,
    * when one hot cell's linear scan cost starts to dominate probed
    * search time. Cell-LOCAL by design: the hot cell's vectors are
    * re-filed by argmax over its two sub-centroids and land under
    * FRESH cell ids; every other cell directory keeps its files
    * byte-for-byte, and the quantizer is NOT retrained — the returned
    * table is the input minus the split centroids plus the
    * sub-centroids (split ids are retired, never reused). Inverted
    * lists here are FILED lists, not exact Voronoi cells — the
    * standard IVF maintenance decoupling: probes rank the new table
    * and the gate measures recall stays healthy rather than claiming
    * assignment-equality to a full retrain.
    *
    * Crash safety (the [[ivfCompact]] discipline, adapted to an
    * id-CHANGING swap): the marker records `old:sub1,sub2` BEFORE any
    * move; recovery ROLLS FORWARD when both sub-cell dirs are live
    * (only cleanup remained) and ROLLS BACK otherwise (drop partial
    * sub-cells, restore the aside original) — the completed-swap test
    * can't be "dst exists" as in compact, because the replacement dirs
    * have different names than the original. */
  def ivfRebalance(s: SparkSession, path: String,
      cents: Seq[(Int, Seq[Double])],
      maxCellRows: Long): Seq[(Int, Seq[Double])] = {
    import java.nio.file.{Files, Paths}
    val aside = Paths.get(path + "_rebalance_old")
    val marker = Paths.get(path + "_rebalance_inprogress")
    if (Files.exists(marker)) {
      val parts = Files.readString(marker).trim.split("[:,]")
      val oldId = parts(0)
      val sids = parts.drop(1).toSeq
      val subsLive = sids.forall(sid =>
        Files.isDirectory(Paths.get(path, s"cell=$sid")))
      if (!subsLive) { // roll back the interrupted split
        sids.foreach(sid => graft.lake.Lake.deleteRecursively(
          Paths.get(path, s"cell=$sid").toFile))
        val src = aside.resolve(s"cell=$oldId")
        val dst = Paths.get(path, s"cell=$oldId")
        if (Files.isDirectory(src) && !Files.exists(dst))
          Files.move(src, dst)
      } // else: both sub-cells landed — only cleanup remained
      graft.lake.Lake.deleteRecursively(aside.toFile)
      Files.deleteIfExists(marker)
    }
    val oversized = s.read.parquet(path).groupBy(col("cell"))
      .agg(count(lit(1)).as("sz"))
      .filter(col("sz") > maxCellRows)
      .select(col("cell")).collect().map(_.getInt(0)).sorted // ≤ C ids
    if (oversized.isEmpty) return cents
    var table = cents
    var nextId = cents.map(_._1).max + 1
    oversized.foreach { cellId =>
      val cellVecs = s.read.parquet(path)
        .filter(col("cell") === cellId)
        .select(col("vec_id"), col("uv").as("embedding"))
      val sub = ivfTrain(cellVecs, c = 2, iters = 2)
      val renumbered = sub.zipWithIndex.map { case ((_, v), i) =>
        (nextId + i, v)
      }
      val subIds = renumbered.map(_._1)
      nextId += renumbered.length
      val tmp = path + "_rebalance_tmp"
      ivfAssign(cellVecs, renumbered)
        .write.mode("overwrite").partitionBy("cell").parquet(tmp)
      Files.createDirectories(aside)
      Files.writeString(marker, s"$cellId:${subIds.mkString(",")}")
      val dst = Paths.get(path, s"cell=$cellId")
      if (Files.exists(dst)) Files.move(dst, aside.resolve(s"cell=$cellId"))
      subIds.foreach { sid =>
        val src = Paths.get(tmp, s"cell=$sid")
        if (Files.isDirectory(src))
          Files.move(src, Paths.get(path, s"cell=$sid"))
      }
      graft.lake.Lake.deleteRecursively(aside.toFile)
      Files.deleteIfExists(marker)
      graft.lake.Lake.deleteRecursively(Paths.get(tmp).toFile)
      table = table.filterNot(_._1 == cellId) ++ renumbered
    }
    table
  }

  /** [[ivfSearchIndex]] over the merge-on-read scan. */
  def ivfSearchIndexMor(spark: SparkSession, path: String,
      queries: DataFrame, cents: Seq[(Int, Seq[Double])], k: Int,
      nprobe: Int): DataFrame = {
    val idx = ivfReadIndex(spark, path)
      .select(col("vec_id").as("c_id"), col("uv").as("cv"), col("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    idx.join(broadcast(ivfProbes(queries, cents, nprobe)), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", dot(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("cos"), 6).as("sim"))
  }

  // ------------------------------------------------------------ PQ

  /** Sub-vector `s` of a concatenated PQ layout: dims [s·dSub, (s+1)·dSub). */
  private def subSlice(uv: Column, s: Int, dSub: Int): Column =
    slice(uv, s * dSub + 1, dSub)

  /** Codebooks as the nested primitive array the native kernels take
    * ([[graft.functions.Pq]]). A Column-API spelling of the per-code
    * argmin would be an expression tree with one node per centroid —
    * 256 nodes at m=8 × ksub=32 blow Janino's 64 KB per-method limit
    * and drop the whole encode stage to interpreted eval; the native
    * kernels carry the codebook as a plan reference object instead. */
  private def booksArray(
      books: IndexedSeq[IndexedSeq[Seq[Double]]]): Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  /** Product-quantization codebook training (Jégou et al., PAMI'11
    * "Product quantization for nearest neighbor search"): the
    * unit-normalized vector is split into `m` sub-vectors and each
    * sub-space learns its own `ksub`-centroid Lloyd quantizer, so a
    * vector compresses to m small codes (m=8, ksub=16 → 8 bytes vs 512
    * of raw doubles, 64×) while the codebook spans ksub^m composite
    * cells. All m sub-space k-means run JOINTLY: one dataflow per Lloyd
    * iteration (assign codes map-side against literal centroids, explode
    * to (sub, code, pos) cells, partial-agg means) — m·ksub·dSub
    * doubles reach the driver per iteration, never vectors. Seeds are
    * the `ksub` lowest-id vectors' slices (deterministic); means round
    * to an 8-decimal grid IN-PLAN so trained codebooks are independent
    * of partitioning (the ivfTrain treatment). Empty cells keep their
    * previous centroid. Returns books(sub)(code) = centroid. */
  def pqTrain(vecs: DataFrame, m: Int, ksub: Int,
      iters: Int): IndexedSeq[IndexedSeq[Seq[Double]]] =
    pqTrainOn(vecs.select(col("vec_id"),
      unitNorm(asDouble(col("embedding"))).as("uv")), m, ksub, iters)

  /** Codebook training over an arbitrary (vec_id, uv) frame — the
    * residual-quantization entry point ([[ivfPqTrain]] feeds residuals
    * here, which must NOT be re-normalized). */
  private[ext] def pqTrainOn(uv: DataFrame, m: Int, ksub: Int,
      iters: Int): IndexedSeq[IndexedSeq[Seq[Double]]] = {
    val seeds = uv.orderBy(col("vec_id")).limit(ksub).select(col("uv"))
      .collect().toIndexedSeq.map(_.getSeq[Double](0))
    require(seeds.nonEmpty, "pqTrain: empty corpus")
    val d = seeds.head.length
    require(d % m == 0, s"pqTrain: dim $d not divisible by m = $m")
    val dSub = d / m
    var books: IndexedSeq[IndexedSeq[Seq[Double]]] =
      (0 until m).map { s =>
        (0 until ksub).map { c =>
          seeds(c % seeds.length).slice(s * dSub, (s + 1) * dSub)
        }
      }
    for (_ <- 0 until iters) {
      val means = uv
        .withColumn("codes",
          graft.functions.Pq.pqCodes(col("uv"), booksArray(books)))
        .select(explode(array((0 until m).map { s =>
          struct(lit(s).as("sub"),
            element_at(col("codes"), s + 1).as("code"),
            subSlice(col("uv"), s, dSub).as("sv"))
        }: _*)).as("e"))
        .select(col("e.sub").as("sub"), col("e.code").as("code"),
          posexplode(col("e.sv")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(round(avg(col("col")), 8).as("mu"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
        .groupBy(_._1).view
        .mapValues(rs => rs.map(_._2).sortBy(_._1).map(_._2).toSeq).toMap
      books = (0 until m).map(s => (0 until ksub).map(c =>
        means.getOrElse((s, c), books(s)(c))))
    }
    books
  }

  /** PQ encode: (vec_id, uv, codes) with codes(s) = the sub-space-s
    * code — m argmins against literal centroids, map-side, no shuffle.
    * At cluster scale the (vec_id, codes) projection IS the stored
    * index: m bytes a vector, memory-resident where raw floats are
    * not. */
  def pqEncode(vecs: DataFrame,
      books: IndexedSeq[IndexedSeq[Seq[Double]]]): DataFrame =
    vecs.select(col("vec_id"), unitNorm(asDouble(col("embedding"))).as("uv"))
      .withColumn("codes",
        graft.functions.Pq.pqCodes(col("uv"), booksArray(books)))

  /** E3g: PQ top-k via ADC (asymmetric distance computation) + exact
    * re-rank — the third ANN scale path (compressed-domain scoring,
    * complementing the signature scan and IVF cell pruning). Each query
    * precomputes its look-up table lut(s)(c) = ⟨q_s, cent_{s,c}⟩
    * (m·ksub dots against literal centroids, broadcast with the query);
    * a corpus vector's approximate cosine is then m array lookups over
    * its codes — the raw floats are NOT touched during the scan, and
    * only (q_id, c_id, approx) triples reach the top-`rerank` rank.
    * The `rerank` survivors (≤ rerank·|queries| rows, absolute) fetch
    * their raw vectors back by id and re-score exactly. ADC error is
    * the quantization error of the codebooks, so rerank ≫ k absorbs
    * ranking inversions; measured on the synthetic embeddings (m=8,
    * ksub=32, 2 Lloyd iters, rerank=100 = 2% of the sf0.1 corpus):
    * recall of the exact top-5 ≈ 0.80 at sf0.1, higher at the
    * smaller SFs. */
  def pqSearch(corpus: DataFrame, queries: DataFrame,
      books: IndexedSeq[IndexedSeq[Seq[Double]]], k: Int,
      rerank: Int): DataFrame = {
    val coded = pqEncode(corpus, books)
      .select(col("vec_id").as("c_id"), col("codes"))
    val q = queries.select(col("vec_id").as("q_id"),
        unitNorm(asDouble(col("embedding"))).as("qv"))
      .withColumn("lut",
        graft.functions.Pq.pqLut(col("qv"), booksArray(books)))
    val approx = graft.functions.Pq.pqAdc(col("lut"), col("codes"))
    val wA = Window.partitionBy(col("q_id"))
      .orderBy(col("approx").desc, col("c_id"))
    val cand = coded
      .join(broadcast(q.select(col("q_id"), col("lut"))),
        col("q_id") =!= col("c_id"))
      .withColumn("approx", approx)
      .select(col("q_id"), col("c_id"), col("approx"))
      .withColumn("_ar", row_number().over(wA))
      .filter(col("_ar") <= rerank)
      .select(col("q_id"), col("c_id"))
    exactRerank(cand, corpus, queries, k)
  }

  /** Persist the PQ index: (vec_id, codes) — m small ints per vector,
    * the memory-resident artifact a 100 TB deployment scans instead of
    * raw floats (64 B/vector at m=8 parquet-encoded vs 512 B). Codes
    * are deterministic given the codebook, so an index search must
    * EQUAL the in-memory answer. */
  def pqWriteIndex(corpus: DataFrame,
      books: IndexedSeq[IndexedSeq[Seq[Double]]], path: String): Unit =
    pqEncode(corpus, books).select(col("vec_id"), col("codes"))
      .write.mode("overwrite").parquet(path)

  /** Search the on-disk PQ index: ADC scan over the stored codes (the
    * raw-vector table is touched only by the exact re-rank, keyed by
    * the ≤ rerank·|queries| candidate ids). */
  def pqSearchIndex(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, books: IndexedSeq[IndexedSeq[Seq[Double]]],
      k: Int, rerank: Int): DataFrame = {
    val coded = spark.read.parquet(path)
      .select(col("vec_id").as("c_id"), col("codes"))
    val q = queries.select(col("vec_id").as("q_id"),
        unitNorm(asDouble(col("embedding"))).as("qv"))
      .withColumn("lut",
        graft.functions.Pq.pqLut(col("qv"), booksArray(books)))
    val wA = Window.partitionBy(col("q_id"))
      .orderBy(col("approx").desc, col("c_id"))
    val cand = coded
      .join(broadcast(q.select(col("q_id"), col("lut"))),
        col("q_id") =!= col("c_id"))
      .withColumn("approx",
        graft.functions.Pq.pqAdc(col("lut"), col("codes")))
      .select(col("q_id"), col("c_id"), col("approx"))
      .withColumn("_ar", row_number().over(wA))
      .filter(col("_ar") <= rerank)
      .select(col("q_id"), col("c_id"))
    exactRerank(cand, corpus, queries, k)
  }

  /** Shared tail of the compressed-domain searches: fetch raw vectors
    * for the (small, absolute-budget) candidate set by id and re-score
    * exactly — candidates shuffle, the corpus never re-sorts. */
  private def exactRerank(cand: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val wE = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    val cv = corpus.select(col("vec_id").as("c_id"),
      unitNorm(asDouble(col("embedding"))).as("cv"))
    val qv = queries.select(col("vec_id").as("q_id"),
      unitNorm(asDouble(col("embedding"))).as("qv"))
    cand.join(cv, Seq("c_id"))
      .join(broadcast(qv), Seq("q_id"))
      .withColumn("cos", dot(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("cos"), 6).as("sim"))
  }

  /** Literal centroid table indexed by cell id (C·d doubles —
    * kilobytes in the plan). */
  private def centsLit(cents: Seq[(Int, Seq[Double])]): Column =
    typedlit(cents.sortBy(_._1).map(_._2))

  /** Residual PQ codebook training (IVFADC, Jégou et al. PAMI'11 §V):
    * quantize r = x − c(x) — the residual after the IVF coarse cell —
    * instead of x itself, which concentrates the codebooks on the
    * within-cell distribution and cuts quantization error at the same
    * code budget. Residuals are NOT re-normalized. */
  def ivfPqTrain(vecs: DataFrame, cents: Seq[(Int, Seq[Double])],
      m: Int, ksub: Int, iters: Int): IndexedSeq[IndexedSeq[Seq[Double]]] = {
    val residuals = ivfAssign(vecs, cents)
      .select(col("vec_id"),
        zip_with(col("uv"), element_at(centsLit(cents), col("cell") + 1),
          (a, b) => a - b).as("uv"))
    pqTrainOn(residuals, m, ksub, iters)
  }

  /** E3h: IVF-PQ search — the composed FAISS-style IVFADC dataflow and
    * the shape that carries ANN to 100 TB: the IVF cells prune WHICH
    * vectors are scanned (an equi-join on cell against the broadcast
    * probe list — no nested-loop scan anywhere), and PQ codes decide
    * HOW each survivor is scored (m byte-code lookups; the raw floats
    * stay untouched until the exact re-rank). Per probed cell the
    * query contributes dot(q, c) once; each corpus vector in the cell
    * adds the ADC estimate of dot(q, r_x) from the residual codebooks:
    * dot(q, x) ≈ dot(q, c) + Σ_s lut_q(s)(codes_x(s)). Top-`rerank`
    * by the estimate, then exact re-score — ≤ rerank·|queries| raw
    * vectors fetched, absolute. */
  def ivfPqSearch(corpus: DataFrame, queries: DataFrame,
      cents: Seq[(Int, Seq[Double])],
      books: IndexedSeq[IndexedSeq[Seq[Double]]],
      k: Int, nprobe: Int, rerank: Int): DataFrame =
    ivfPqSearchCoded(ivfPqCode(corpus, cents, books), corpus, queries,
      cents, books, k, nprobe, rerank)

  /** Residual-encode a vector set against FROZEN artifacts (cells +
    * codebooks): (c_id, cell, codes). Entirely map-side — assignment
    * is a literal-centroid argmax, encoding m native argmin kernels;
    * nothing shuffles. The same function is the index BUILD (whole
    * corpus) and the index INGEST (a new batch encodes against the
    * frozen artifacts and appends partition-locally — no retrain). */
  def ivfPqCode(vecs: DataFrame, cents: Seq[(Int, Seq[Double])],
      books: IndexedSeq[IndexedSeq[Seq[Double]]]): DataFrame =
    ivfAssign(vecs, cents)
      .withColumn("res",
        zip_with(col("uv"), element_at(centsLit(cents), col("cell") + 1),
          (a, b) => a - b))
      .select(col("vec_id").as("c_id"), col("cell"),
        graft.functions.Pq.pqCodes(col("res"), booksArray(books)).as("codes"))

  /** The ADC scan + bounded exact re-rank over an ALREADY-CODED corpus
    * (in-memory, or read back from the cell-partitioned on-disk
    * index). `rawVecs` supplies raw floats for the re-rank only —
    * ≤ rerank·|queries| of them are ever fetched. */
  def ivfPqSearchCoded(coded: DataFrame, rawVecs: DataFrame,
      queries: DataFrame, cents: Seq[(Int, Seq[Double])],
      books: IndexedSeq[IndexedSeq[Seq[Double]]],
      k: Int, nprobe: Int, rerank: Int): DataFrame = {
    val cl = centsLit(cents)
    val probes = ivfProbes(queries, cents, nprobe)
      .withColumn("qc", dot(col("qv"), element_at(cl, col("cell") + 1)))
      .withColumn("lut", graft.functions.Pq.pqLut(col("qv"), booksArray(books)))
      .select(col("q_id"), col("cell"), col("qc"), col("lut"))
    val wA = Window.partitionBy(col("q_id"))
      .orderBy(col("approx").desc, col("c_id"))
    val cand = coded.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("approx",
        col("qc") + graft.functions.Pq.pqAdc(col("lut"), col("codes")))
      .select(col("q_id"), col("c_id"), col("approx"))
      .withColumn("_ar", row_number().over(wA))
      .filter(col("_ar") <= rerank)
      .select(col("q_id"), col("c_id"))
    exactRerank(cand, rawVecs, queries, k)
  }

  /** Persist the IVFADC index: the coded corpus laid out as a
    * cell-partitioned parquet table — codes only (m small ints per
    * vector), never raw floats; at 100 TB this artifact is ~1-2% of
    * the embedding table it indexes. */
  def ivfPqWriteIndex(corpus: DataFrame, cents: Seq[(Int, Seq[Double])],
      books: IndexedSeq[IndexedSeq[Seq[Double]]], path: String): Unit =
    ivfPqCode(corpus, cents, books)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Search the on-disk IVFADC index. The broadcast probe list joins
    * the index on its PARTITION column, so dynamic partition pruning
    * skips unprobed cell directories (the ivfSearchIndex shape); the
    * ADC scan reads codes only, and `rawVecs` (the raw embedding
    * table) is consulted just for the bounded exact re-rank. */
  def ivfPqSearchIndex(spark: SparkSession, path: String,
      rawVecs: DataFrame, queries: DataFrame,
      cents: Seq[(Int, Seq[Double])],
      books: IndexedSeq[IndexedSeq[Seq[Double]]],
      k: Int, nprobe: Int, rerank: Int): DataFrame =
    ivfPqSearchCoded(
      spark.read.parquet(path).select(col("c_id"), col("cell"), col("codes")),
      rawVecs, queries, cents, books, k, nprobe, rerank)

  /** [[ivfPqSearchIndex]] over the merge-on-read scan (tombstones
    * applied to the coded table as a broadcast anti-join on c_id;
    * deleted ids can then never reach candidate generation, so the
    * bounded exact re-rank against `rawVecs` cannot resurface them). */
  def ivfPqSearchIndexMor(spark: SparkSession, path: String,
      rawVecs: DataFrame, queries: DataFrame,
      cents: Seq[(Int, Seq[Double])],
      books: IndexedSeq[IndexedSeq[Seq[Double]]],
      k: Int, nprobe: Int, rerank: Int): DataFrame =
    ivfPqSearchCoded(
      ivfReadIndex(spark, path, idCol = "c_id")
        .select(col("c_id"), col("cell"), col("codes")),
      rawVecs, queries, cents, books, k, nprobe, rerank)

  /** k-NN label classification by majority vote over the exact top-k
    * cosine neighbors (leave-one-out: a query never votes for itself).
    * Vote ties break on the smaller label; the expensive part is
    * [[bruteForceTopK]] (queries broadcast, corpus never shuffles), the
    * vote itself is a |q|·k-row groupBy. Returns one row per query:
    * (q_id, true_label, pred_label, correct). */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val labels = corpus.select(col("vec_id").as("c_id"),
      col("label").as("n_label"))
    val votes = bruteForceTopK(queries, corpus, k)
      .join(labels, Seq("c_id"))
      .groupBy(col("q_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("n_label"))
    val pred = votes.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(col("q_id"), col("n_label").as("pred_label"))
    queries.select(col("vec_id").as("q_id"), col("label").as("true_label"))
      .join(pred, Seq("q_id"))
      .select(col("q_id"), col("true_label"), col("pred_label"),
        (col("true_label") === col("pred_label")).as("correct"))
  }

  /** Hard-negative mining for contrastive training: each anchor's
    * top-`k` most-similar vectors with a DIFFERENT label — the
    * negatives that actually move a contrastive loss (random negatives
    * are trivially separable; the hardest ones live next to the
    * decision boundary). Anchors broadcast; the corpus is scanned
    * map-side and never shuffles — with a bounded anchor set this IS
    * the 100 TB shape, and for corpus-sized anchor sets the scan slots
    * behind [[annCandidates]]/IVF pruning with the label test moved
    * into the refinement (same composition as
    * [[cosineNearDupViaAnn]]). */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val q = anchors.select(col("vec_id").as("q_id"),
        col("label").as("q_label"), asDouble(col("embedding")).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus.select(col("vec_id").as("c_id"),
        col("label").as("c_label"), asDouble(col("embedding")).as("cv"))
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    c.join(broadcast(q), col("q_label") =!= col("c_label"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("q_label"), col("rnk"), col("c_id"),
        col("c_label"), round(col("cos"), 6).as("sim"))
  }

  // ------------------------------------------------------------ MIPS

  /** Maximum-inner-product search via the norm-augmentation reduction
    * (Bachrach et al., RecSys'14; Neyshabur & Srebro, ICML'15): append
    * one coordinate — √(M²−‖x‖²) on the corpus side (M = max corpus
    * norm), 0 on the query side — and every augmented corpus vector
    * has norm exactly M, so augmented-cosine order IS inner-product
    * order and the whole cosine-ANN stack (signatures, IVF, PQ)
    * becomes a MIPS index unchanged. Returns (corpusAug, queriesAug)
    * with the augmented array in `embedding`, ready for
    * [[annCandidates]]/[[bruteForceTopK]]-style consumers. The corpus
    * max-norm is a 1-row aggregate crossJoined in-plan (no driver
    * action); `greatest(…, 0)` guards the sqrt against the max-norm
    * vector's own float rounding. */
  def mipsAugment(corpus: DataFrame,
      queries: DataFrame): (DataFrame, DataFrame) = {
    val c = corpus.select(col("vec_id"),
        asDouble(col("embedding")).as("cv"))
      .withColumn("cn2", dot(col("cv"), col("cv")))
    val mrow = c.agg(max(sqrt(col("cn2"))).as("bigM"))
    val caug = c.crossJoin(broadcast(mrow))
      .withColumn("aug",
        sqrt(greatest(col("bigM") * col("bigM") - col("cn2"), lit(0.0))))
      .select(col("vec_id"),
        concat(col("cv"), array(col("aug"))).as("embedding"))
    val qaug = queries.select(col("vec_id"),
        concat(asDouble(col("embedding")), array(lit(0.0)))
          .as("embedding"))
    (caug, qaug)
  }

  // ------------------------------------------------------------ queries

  /** E3j: exact MIPS top-5 through the augmentation — ranked by the
    * AUGMENTED dot product (whose tail term is an exact float 0·aug =
    * 0, so it is bit-equal to the plain inner product and DuckDB's
    * direct `list_dot_product` ranking reproduces it exactly). A wrong
    * augmented coordinate, a NaN from the max-norm vector's own sqrt,
    * or a reduction that reorders any top-k all hash-fail. */
  private val e3MipsTopk: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val (caug, qaug) = mipsAugment(emb, emb.filter(col("vec_id") < 5))
    val q = qaug.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = caug.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("ip").desc, col("c_id"))
    c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("ip", dot(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("ip"), 6).as("ip"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** E3k ✱: the ANN-MIPS path — hyperplane signatures built over the
    * AUGMENTED space (the reduction is exactly what makes a cosine LSH
    * index answer inner-product queries), candidate recall of the
    * exact inner-product top-5 gated ≥ 0.5 with the absolute per-query
    * budget in-plan — the same self-check shape as `e3_ann_recall`. */
  private val e3MipsAnn: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val (caug, qaug) = mipsAugment(emb, emb.filter(col("vec_id") < 50))
    val q = qaug.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = caug.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("ip").desc, col("c_id"))
    val exact = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("ip", dot(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("c_id"))
    val cand = annCandidates(caug, qaug, budget = 150, tau = 112)
      .localCheckpoint(eager = false)
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

  /** E3i: hard negatives for a deterministic 8-anchor set, full
    * value-level oracle — DuckDB recomputes the different-label top-5
    * from the same parquet, so a same-label leak, a wrong rank, or a
    * tie broken the other way all hash-fail. */
  private val e3HardNegatives: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    hardNegatives(emb.filter(col("vec_id") < 8), emb, k = 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  // --------------------------------------------------- hybrid retrieval

  /** Lexical top-k: 3-word-shingle Jaccard of each query doc against
    * the corpus, ranked per query. At gate SF this is the exact
    * broadcast-query scan (the verification harness shape); at 100 TB
    * the candidate set comes from the banded MinHash/prefix-filter
    * index (gated separately by the `e2_*` family) and only the
    * rank-k list below survives — the fusion never sees the corpus. */
  def lexicalTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("doc_id").as("q_id"),
      Dedup.shingles(col("text"), 3).as("qsh"))
    val c = corpus.select(col("doc_id").as("c_id"),
      Dedup.shingles(col("text"), 3).as("csh"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("jac").desc, col("c_id"))
    c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("jac",
        graft.functions.JaccardSim.jaccardSim(col("qsh"), col("csh")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("c_id"), col("rnk"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09): score =
    * Σ 1/(c + rank) over the retrievers that returned the candidate.
    * Rank-only — the two score scales (Jaccard vs cosine) never mix,
    * which is exactly why RRF is the default fuser in hybrid search.
    * Both inputs are top-k lists, so the fusion join touches
    * |queries|·k rows regardless of corpus size. */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int,
      c: Int = 60): DataFrame = {
    val l = lex.select(col("q_id"), col("c_id"), col("rnk").as("lex_rank"))
    val d = dense.select(col("q_id"), col("c_id"),
      col("rnk").as("dense_rank"))
    val fused = l.join(d, Seq("q_id", "c_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("dense_rank")), lit(0.0)))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("c_id"))
    fused.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("rrf"), 6).as("rrf"),
        coalesce(col("lex_rank"), lit(0)).cast("long").as("lex_rank"),
        coalesce(col("dense_rank"), lit(0)).cast("long").as("dense_rank"))
  }

  /** E3m: HYBRID retrieval — the RAG-stack default: a lexical ranker
    * (shingle Jaccard, the BM25 stand-in with an exact SQL
    * restatement) and a dense ranker (cosine over the embedding
    * column) fused by reciprocal rank. Query set `doc_id % 167 = 3`
    * (scale-proportional, non-empty from sf0.001 up); embeddings join
    * positionally (vec_id = doc_id, the corpus contract). Full
    * value-level oracle: DuckDB re-derives both rankings, the fusion
    * arithmetic (identical double ops), and the final top-5 — a wrong
    * rank on EITHER side, a lost candidate, or a tie broken the other
    * way all hash-fail. */
  private val e3HybridRrf: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val emb = t(s, dir, "embeddings")
    val lex = lexicalTopK(docs.filter(col("doc_id") % 167 === 3), docs,
      k = 20)
    val dense = bruteForceTopK(emb.filter(col("vec_id") % 167 === 3), emb,
      k = 20).select(col("q_id"), col("c_id"), col("rnk"))
    rrfFuse(lex, dense, k = 5).orderBy(col("q_id"), col("rnk"))
  }

  /** E3n: MATRYOSHKA (truncated-dimension) retrieval — the MRL
    * serving pattern (Kusupati et al., NeurIPS'22): rank with only the
    * FIRST 16 of 64 dimensions (4× less memory traffic and index
    * footprint — at 100 TB the short prefix IS the index and the full
    * vector only re-ranks), then report each query's top-5 under the
    * truncated metric plus its overlap with the full-dimension top-5
    * (the quality-vs-cost signal that decides the serving dim). Both
    * rankings and the overlap are exact and fully DuckDB-restated —
    * a wrong slice bound, an unrenormalized norm, or a tie broken the
    * other way all hash-fail. */
  private val e3Matryoshka: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val t16 = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 16).as("embedding"))
    val qPred = col("vec_id") % 167 === 3
    val short = bruteForceTopK(t16.filter(qPred), t16, k = 5)
    val full = bruteForceTopK(emb.filter(qPred), emb, k = 5)
      .select(col("q_id"), col("c_id"))
    val overlap = short.select(col("q_id"), col("c_id"))
      .join(full, Seq("q_id", "c_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("overlap5"))
    short.join(overlap, Seq("q_id"), "left")
      .select(col("q_id"), col("rnk"), col("c_id"), col("sim"),
        coalesce(col("overlap5"), lit(0L)).as("overlap5"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** E3: exact cosine top-5 for the first 5 vectors, against the full
    * corpus — DuckDB recomputes it from the same parquet. */
  private val e3CosineTopk: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** E3g: leave-one-out 5-NN classification over a 2%-sampled query
    * set (`vec_id % 50 = 0` — deterministic, scale-proportional). The
    * oracle recomputes the identical vote in SQL, so a wrong neighbor
    * set, a lost vote, or a tie broken the other way all hash-fail. */
  private val e3KnnClassify: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    knnClassify(emb, emb.filter(col("vec_id") % 50 === 0), k = 5)
      .orderBy(col("q_id"))
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
      budget = 150, tau = 112).localCheckpoint(eager = false)
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

  /** E3d: IVF self-check — recall of the exact top-5 through the
    * cell-probing path must clear 0.5 (measured ≈ 0.83 at all gate
    * SFs), and the scan budget must hold: no query's probed cells may
    * cover more than half the corpus (measured ≈ 25% at nprobe/C =
    * 8/32; the bound is the "strictly better than a full scan" line
    * with 2× cell-imbalance slack). Emits booleans for the constant
    * oracle. */
  private val e3IvfRecall: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val cents = ivfTrain(emb, c = 32, iters = 2)
    val exact = bruteForceTopK(queries, emb, k = 5)
      .select(col("q_id"), col("c_id"))
    val found = ivfTopK(emb, queries, cents, k = 5, nprobe = 8)
      .select(col("q_id"), col("c_id"))
    val hitsAgg = exact.join(found, Seq("q_id", "c_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    // per-query scanned volume = sum of probed cell sizes
    val cellSizes = ivfAssign(emb, cents).groupBy(col("cell"))
      .agg(count(lit(1)).as("sz"))
    val scanAgg = ivfProbes(queries, cents, nprobe = 8)
      .select(col("q_id"), col("cell")).join(cellSizes, Seq("cell"))
      .groupBy(col("q_id")).agg(sum(col("sz")).as("scanned"))
      .agg(max(col("scanned")).as("max_scanned"))
    val nAgg = emb.agg(count(lit(1)).as("n"))
    hitsAgg.crossJoin(totalAgg).crossJoin(scanAgg).crossJoin(nAgg).select(
      (col("hits").cast("double") / col("total") >= 0.5).as("recall_ok"),
      (col("max_scanned") <= col("n") / 2).as("scan_budget_ok"))
  }

  /** E3k ✱: IVF INDEX INGEST — the ingest-time half of the persistent
    * ANN story (e3_ivf_indexed builds and searches an index but never
    * grows one): a NEW embedding batch (vec_id ≡ 0 mod 4, held out of
    * the build) is assigned to the EXISTING index's cells — broadcast
    * frozen centroids, map-side argmax, NO retrain, resident cell data
    * untouched — and APPENDED into the cell-partitioned layout, so the
    * write touches only the `cell=` directories the batch lands in.
    * This is exactly how a production IVF index absorbs a day's new
    * embeddings at 100 TB: assignment is embarrassingly parallel, the
    * append is partition-local, and retraining stays an offline
    * decision. Gates (✱, constant-true oracle): (a) searching the
    * grown index EQUALS the in-memory cell path over corpus+batch
    * under the same frozen centroids — a lost, duplicated, or
    * mis-assigned appended row breaks equality; (b) recall of the
    * exact top-5 over corpus+batch clears 0.5 on centroids that never
    * saw the batch (measured ≈ 0.8 at the gate SFs); (c) no query's
    * probed cells cover more than half the grown corpus. */
  private val e3IvfIncremental: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val resident = emb.filter(col("vec_id") % 4 =!= 0)
    val batch = emb.filter(col("vec_id") % 4 === 0)
    val queries = emb.filter(col("vec_id") < 50)
    val cents = ivfTrain(resident, c = 32, iters = 2) // frozen at build
    val path = graft.lake.Lake.scratchDir("ivfinc") + "/index"
    ivfWriteIndex(resident, cents, path)
    // INGEST: assign only the batch, append into the cell layout.
    ivfAssign(batch, cents)
      .write.mode("append").partitionBy("cell").parquet(path)
    val viaIndex = ivfSearchIndex(s, path, queries, cents, k = 5, nprobe = 8)
    val inMemory = ivfTopK(emb, queries, cents, k = 5, nprobe = 8)
    val extraAgg = viaIndex.exceptAll(inMemory).agg(count(lit(1)).as("extra"))
    val missAgg = inMemory.exceptAll(viaIndex).agg(count(lit(1)).as("missing"))
    val exact = bruteForceTopK(queries, emb, k = 5)
      .select(col("q_id"), col("c_id"))
    val hitsAgg = exact.join(viaIndex.select(col("q_id"), col("c_id")),
      Seq("q_id", "c_id"), "left_semi").agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val cellSizes = s.read.parquet(path).groupBy(col("cell"))
      .agg(count(lit(1)).as("sz"))
    val scanAgg = ivfProbes(queries, cents, nprobe = 8)
      .select(col("q_id"), col("cell")).join(cellSizes, Seq("cell"))
      .groupBy(col("q_id")).agg(sum(col("sz")).as("scanned"))
      .agg(max(col("scanned")).as("max_scanned"))
    val nAgg = emb.agg(count(lit(1)).as("n"))
    extraAgg.crossJoin(missAgg).crossJoin(hitsAgg).crossJoin(totalAgg)
      .crossJoin(scanAgg).crossJoin(nAgg).select(
        (col("extra") === 0 && col("missing") === 0)
          .as("ingest_equals_memory"),
        (col("hits").cast("double") / col("total") >= 0.5).as("recall_ok"),
        (col("max_scanned") <= col("n") / 2).as("scan_budget_ok"))
  }

  /** E3r ✱: IVF index REBALANCE — the maintenance step completing the
    * lifecycle (build → search → ingest → delete → compact → split):
    * skewed ingest floods ONE hot cell (copies of its own vectors
    * under fresh ids — same argmax by construction, so the skew is
    * surgical), [[ivfRebalance]] splits exactly that cell into two
    * locally-trained sub-cells, and the gate requires: every OTHER
    * cell directory byte-identical (relative file listing + sizes
    * compared, the k30 discipline), no row lost or duplicated across
    * the swap, the hot cell's replacement strictly smaller on both
    * sides, the retired centroid id gone from the returned table (one
    * net extra entry), recall ≥ 0.5 searching with the NEW table, and
    * the worst query's probed-row mass no worse than the flooded
    * layout's and ≤ 3n/4 absolute. */
  private val e3IvfRebalance: Q = (s, dir) => {
    import java.nio.file.{Files, Paths}
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val cents = ivfTrain(emb, c = 16, iters = 2)
    val path = graft.lake.Lake.scratchDir("ivfreb") + "/index"
    ivfWriteIndex(emb, cents, path)
    val hotRow = s.read.parquet(path).groupBy(col("cell"))
      .agg(count(lit(1)).as("sz"))
      .orderBy(col("sz").desc, col("cell")).head()
    val (hot, hotSz) = (hotRow.getInt(0), hotRow.getLong(1))
    val batch = s.read.parquet(path).filter(col("cell") === hot)
      .select((col("vec_id") + lit(1000000000L)).as("vec_id"),
        col("uv").as("embedding"))
    ivfAssign(batch, cents)
      .write.mode("append").partitionBy("cell").parquet(path)
    val nTotal = s.read.parquet(path).count()
    // the flooded layout's probe cost (one small row to the driver —
    // the "before" side of the improvement claim; the layout at `path`
    // is rewritten in place, so it can't be re-derived afterwards)
    val maxScanBefore = {
      val sizes1 = s.read.parquet(path).groupBy(col("cell"))
        .agg(count(lit(1)).as("sz"))
      ivfProbes(queries, cents, nprobe = 8)
        .select(col("q_id"), col("cell")).join(sizes1, Seq("cell"))
        .groupBy(col("q_id")).agg(sum(col("sz")).as("scanned"))
        .agg(max(col("scanned"))).head().getLong(0)
    }
    def listingExcept(exclude: Set[Int]): Map[String, Long] = {
      val root = Paths.get(path)
      val st = Files.walk(root)
      try st.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => (root.relativize(p).toString, Files.size(p)))
        .filterNot { case (rel, _) =>
          exclude.exists(e => rel.startsWith(s"cell=$e/")) }
        .toMap
      finally st.close()
    }
    val before = listingExcept(Set(hot))
    val cents2 = ivfRebalance(s, path, cents, maxCellRows = hotSz)
    val newIds = cents2.map(_._1).toSet -- cents.map(_._1).toSet
    val after = listingExcept(Set(hot) ++ newIds)
    val untouchedIntact = before == after
    val tableOk = newIds.size == 2 && cents2.size == cents.size + 1 &&
      !cents2.exists(_._1 == hot)
    val idx = s.read.parquet(path)
    val sizes2 = idx.groupBy(col("cell")).agg(count(lit(1)).as("sz"))
    val subSizes = sizes2.filter(col("cell")
      .isin(newIds.toSeq.map(Integer.valueOf): _*))
    val splitAgg = subSizes.agg(
      count(lit(1)).as("n_subs"), max(col("sz")).as("sub_max"),
      min(col("sz")).as("sub_min"), sum(col("sz")).as("sub_rows"))
    val lossAgg = idx.agg(count(lit(1)).as("n_rows"),
      countDistinct(col("vec_id")).as("n_ids"))
    val viaIndex = ivfSearchIndex(s, path, queries, cents2,
      k = 5, nprobe = 8)
    val exact = bruteForceTopK(queries,
      idx.select(col("vec_id"), col("uv").as("embedding")), k = 5)
      .select(col("q_id"), col("c_id"))
    val hitsAgg = exact.join(viaIndex.select(col("q_id"), col("c_id")),
      Seq("q_id", "c_id"), "left_semi").agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val scanAgg = ivfProbes(queries, cents2, nprobe = 8)
      .select(col("q_id"), col("cell")).join(sizes2, Seq("cell"))
      .groupBy(col("q_id")).agg(sum(col("sz")).as("scanned"))
      .agg(max(col("scanned")).as("max_scanned"))
    splitAgg.crossJoin(lossAgg).crossJoin(hitsAgg).crossJoin(totalAgg)
      .crossJoin(scanAgg).select(
        lit(untouchedIntact).as("untouched_intact"),
        lit(tableOk).as("table_ok"),
        (col("n_rows") === lit(nTotal) &&
          col("n_ids") === lit(nTotal)).as("no_loss_no_dup"),
        (col("n_subs") === 2 && col("sub_min") >= 1 &&
          col("sub_max") < lit(2L * hotSz) &&
          col("sub_rows") === lit(2L * hotSz)).as("split_shrunk"),
        (col("hits").cast("double") / col("total") >= 0.5)
          .as("recall_ok"),
        // splitting the hot cell must not worsen — and should shrink —
        // the worst query's probed-row mass, and the post-maintenance
        // cost stays bounded away from a full scan even though the
        // flood doubled the hot cell
        (col("max_scanned") <= lit(maxScanBefore) &&
          lit(4L) * col("max_scanned") <= lit(3L) * lit(nTotal))
          .as("scan_budget_ok"))
  }

  /** E3n ✱: IVF-PQ INDEX INGEST — the append-without-retrain gate for
    * the COMPOSED IVFADC artifact (e3_ivf_incremental covers the coarse
    * IVF layer only; this is the index a 100 TB deployment actually
    * stores). A held-out batch (vec_id ≡ 0 mod 4) is assigned to the
    * FROZEN cells and residual-encoded against the FROZEN codebooks —
    * both trained on the resident corpus alone — then appended into the
    * cell-partitioned coded layout; resident files, centroids, and
    * codebooks are never touched. Gates (✱, constant-true oracle):
    * (a) codes_frozen_ok — the grown on-disk coded table EQUALS a fresh
    * in-memory frozen-artifact encode of corpus+batch (catches a lost/
    * duplicated append, a mis-assigned cell, or a code drifting from
    * the frozen books, even where search ranking would hide it);
    * (b) ingest_equals_memory — searching the grown index EQUALS the
    * in-memory IVFADC path over corpus+batch; (c) recall of the exact
    * top-5 clears 0.5 on artifacts that never saw the batch; (d) no
    * query's probed cells cover more than half the grown corpus. */
  private val e3IvfPqIncremental: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val resident = emb.filter(col("vec_id") % 4 =!= 0)
    val batch = emb.filter(col("vec_id") % 4 === 0)
    val queries = emb.filter(col("vec_id") < 50)
    val cents = ivfTrain(resident, c = 32, iters = 2) // frozen at build
    val books = ivfPqTrain(resident, cents, m = 8, ksub = 32, iters = 2)
    val path = graft.lake.Lake.scratchDir("ivfpqinc") + "/index"
    ivfPqWriteIndex(resident, cents, books, path)
    // INGEST: encode only the batch against the frozen artifacts,
    // append into the cell layout — no retrain, residents untouched.
    ivfPqCode(batch, cents, books)
      .write.mode("append").partitionBy("cell").parquet(path)
    val onDisk = s.read.parquet(path)
      .select(col("c_id"), col("cell"), col("codes"))
    val freshCoded = ivfPqCode(emb, cents, books)
    val codeExtraAgg = onDisk.exceptAll(freshCoded)
      .agg(count(lit(1)).as("code_extra"))
    val codeMissAgg = freshCoded.exceptAll(onDisk)
      .agg(count(lit(1)).as("code_missing"))
    val viaIndex = ivfPqSearchIndex(s, path, emb, queries, cents, books,
      k = 5, nprobe = 8, rerank = 100)
    val inMemory = ivfPqSearch(emb, queries, cents, books,
      k = 5, nprobe = 8, rerank = 100)
    val extraAgg = viaIndex.exceptAll(inMemory).agg(count(lit(1)).as("extra"))
    val missAgg = inMemory.exceptAll(viaIndex).agg(count(lit(1)).as("missing"))
    val exact = bruteForceTopK(queries, emb, k = 5)
      .select(col("q_id"), col("c_id"))
    val hitsAgg = exact.join(viaIndex.select(col("q_id"), col("c_id")),
      Seq("q_id", "c_id"), "left_semi").agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val cellSizes = onDisk.groupBy(col("cell"))
      .agg(count(lit(1)).as("sz"))
    val scanAgg = ivfProbes(queries, cents, nprobe = 8)
      .select(col("q_id"), col("cell")).join(cellSizes, Seq("cell"))
      .groupBy(col("q_id")).agg(sum(col("sz")).as("scanned"))
      .agg(max(col("scanned")).as("max_scanned"))
    val nAgg = emb.agg(count(lit(1)).as("n"))
    codeExtraAgg.crossJoin(codeMissAgg).crossJoin(extraAgg)
      .crossJoin(missAgg).crossJoin(hitsAgg).crossJoin(totalAgg)
      .crossJoin(scanAgg).crossJoin(nAgg).select(
        (col("code_extra") === 0 && col("code_missing") === 0)
          .as("codes_frozen_ok"),
        (col("extra") === 0 && col("missing") === 0)
          .as("ingest_equals_memory"),
        (col("hits").cast("double") / col("total") >= 0.5).as("recall_ok"),
        (col("max_scanned") <= col("n") / 2).as("scan_budget_ok"))
  }

  /** E3p ✱: IVFADC INDEX DELETES — the forget-request path for the
    * COMPOSED coded artifact (e3_ivf_delete covers the coarse IVF
    * layer; this is the index a 100 TB deployment actually stores).
    * Tombstones land in the same deletes-sized sidecar keyed on c_id;
    * the MOR search applies them to the CODED table before candidate
    * generation, so the bounded exact re-rank can never resurface a
    * deleted id; compaction is the same partition-local staged swap.
    * Gates (✱, constant-true oracle): (a) MOR search EQUALS a fresh
    * survivor-coded index search under the SAME frozen centroids AND
    * codebooks; (b) deleted ids never surface; (c) post-compaction
    * plain search preserves the answer with the sidecar gone;
    * (d) the compacted coded table EQUALS a frozen-artifact encode of
    * the survivors (a code drifting during compaction hash-fails even
    * where ranking would hide it). */
  private val e3IvfPqDelete: Q = (s, dir) => {
    import java.nio.file.{Files, Paths}
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val cents = ivfTrain(emb, c = 32, iters = 2) // frozen
    val books = ivfPqTrain(emb, cents, m = 8, ksub = 32, iters = 2)
    val path = graft.lake.Lake.scratchDir("ivfpqdel") + "/index"
    ivfPqWriteIndex(emb, cents, books, path)
    val delIds = emb.filter(col("vec_id") % 10 === 3).select("vec_id")
    ivfDelete(delIds, path, idCol = "c_id")
    ivfDelete(delIds.limit(20), path, idCol = "c_id") // replay harmless
    val survivors = emb.filter(col("vec_id") % 10 =!= 3)
    val freshPath = graft.lake.Lake.scratchDir("ivfpqdelf") + "/index"
    ivfPqWriteIndex(survivors, cents, books, freshPath)
    // pre-compaction answer pinned eagerly (≤ queries×k rows) —
    // compaction below mutates the files this plan reads
    val mor = ivfPqSearchIndexMor(s, path, survivors, queries, cents,
      books, k = 5, nprobe = 8, rerank = 100)
      .localCheckpoint(eager = true)
    val fresh = ivfPqSearchIndex(s, freshPath, survivors, queries, cents,
      books, k = 5, nprobe = 8, rerank = 100)
    ivfCompact(s, path, idCol = "c_id")
    val sidecarFolded = !Files.isDirectory(Paths.get(path + "_tombstones"))
    val post = ivfPqSearchIndex(s, path, survivors, queries, cents,
      books, k = 5, nprobe = 8, rerank = 100)
    val onDisk = s.read.parquet(path)
      .select(col("c_id"), col("cell"), col("codes"))
    val survCoded = ivfPqCode(survivors, cents, books)
    val extraAgg = mor.exceptAll(fresh).agg(count(lit(1)).as("extra"))
    val missAgg = fresh.exceptAll(mor).agg(count(lit(1)).as("missing"))
    val leakAgg = mor.join(delIds.withColumnRenamed("vec_id", "c_id"),
      Seq("c_id"), "left_semi").agg(count(lit(1)).as("leaked"))
    val postExtraAgg = post.exceptAll(mor).agg(count(lit(1)).as("p_extra"))
    val postMissAgg = mor.exceptAll(post).agg(count(lit(1)).as("p_missing"))
    val codeExtraAgg = onDisk.exceptAll(survCoded)
      .agg(count(lit(1)).as("c_extra"))
    val codeMissAgg = survCoded.exceptAll(onDisk)
      .agg(count(lit(1)).as("c_missing"))
    extraAgg.crossJoin(missAgg).crossJoin(leakAgg)
      .crossJoin(postExtraAgg).crossJoin(postMissAgg)
      .crossJoin(codeExtraAgg).crossJoin(codeMissAgg)
      .select(
        (col("extra") === 0 && col("missing") === 0)
          .as("mor_equals_fresh"),
        (col("leaked") === 0).as("deleted_never_surface"),
        (col("p_extra") === 0 && col("p_missing") === 0)
          .as("compact_preserves_search"),
        (col("c_extra") === 0 && col("c_missing") === 0)
          .as("codes_compact_ok"),
        lit(sidecarFolded).as("sidecar_folded"))
  }

  /** E3o ✱: IVF INDEX DELETES — the forget-request path the index
    * stack lacked (r11 verdict item 4): k26's deletion-vector pattern
    * composed with the persisted IVF artifact. A delete batch writes
    * vec_ids into a deletes-sized tombstone sidecar (replayed batches
    * are harmless — the read side de-duplicates); search applies the
    * sidecar as a BROADCAST anti-join; compaction stages the
    * survivors of ONLY the affected cells to a temp layout and swaps
    * directories — untouched cells keep their files byte-for-byte,
    * and no retrain happens anywhere. Gates (✱, constant-true
    * oracle): (a) tombstone-applied search EQUALS a fresh-build
    * search over the surviving corpus under the SAME frozen
    * centroids; (b) deleted ids never surface; (c) post-compaction
    * plain search still equals that answer with the sidecar gone;
    * (d) compacted row count equals the survivor count; (e) the
    * unaffected cell directories' file listings are unchanged. */
  private val e3IvfDelete: Q = (s, dir) => {
    import java.nio.file.{Files, Paths}
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val cents = ivfTrain(emb, c = 32, iters = 2) // frozen — no retrain
    val path = graft.lake.Lake.scratchDir("ivfdel") + "/index"
    ivfWriteIndex(emb, cents, path)
    val delIds = emb.filter(col("vec_id") % 10 === 3).select("vec_id")
    ivfDelete(delIds, path)
    ivfDelete(delIds.limit(20), path) // replay must be harmless
    val survivors = emb.filter(col("vec_id") % 10 =!= 3)
    val freshPath = graft.lake.Lake.scratchDir("ivfdelfresh") + "/index"
    ivfWriteIndex(survivors, cents, freshPath)
    // Pre-compaction answers pinned eagerly (bounded: ≤ queries×k
    // rows) — compaction below mutates the files this plan reads.
    val mor = ivfSearchIndexMor(s, path, queries, cents,
      k = 5, nprobe = 8).localCheckpoint(eager = true)
    val fresh = ivfSearchIndex(s, freshPath, queries, cents,
      k = 5, nprobe = 8)
    val affected = s.read.parquet(path)
      .join(broadcast(delIds), Seq("vec_id"), "left_semi")
      .select(col("cell")).distinct().collect().map(_.get(0)).toSet
    def cellListing(): Map[String, Seq[String]] = {
      val ls = Files.list(Paths.get(path))
      val dirs =
        try {
          import scala.jdk.CollectionConverters._
          ls.iterator().asScala.map(_.getFileName.toString)
            .filter(_.startsWith("cell=")).toList
        } finally ls.close()
      dirs.filterNot(d => affected.exists(c => d == s"cell=$c"))
        .map { d =>
          val fs = Files.list(Paths.get(path, d))
          val names =
            try {
              import scala.jdk.CollectionConverters._
              fs.iterator().asScala.map(_.getFileName.toString)
                .toList.sorted
            } finally fs.close()
          d -> names
        }.toMap
    }
    val before = cellListing()
    ivfCompact(s, path)
    val untouchedPreserved = cellListing() == before
    val sidecarFolded = !Files.isDirectory(Paths.get(path + "_tombstones"))
    val post = ivfSearchIndex(s, path, queries, cents, k = 5, nprobe = 8)
    val extraAgg = mor.exceptAll(fresh).agg(count(lit(1)).as("extra"))
    val missAgg = fresh.exceptAll(mor).agg(count(lit(1)).as("missing"))
    val leakAgg = mor.join(delIds.withColumnRenamed("vec_id", "c_id"),
      Seq("c_id"), "left_semi").agg(count(lit(1)).as("leaked"))
    val postExtraAgg = post.exceptAll(mor).agg(count(lit(1)).as("p_extra"))
    val postMissAgg = mor.exceptAll(post).agg(count(lit(1)).as("p_missing"))
    val idxCountAgg = s.read.parquet(path).agg(count(lit(1)).as("idx_n"))
    val survCountAgg = survivors.agg(count(lit(1)).as("surv_n"))
    extraAgg.crossJoin(missAgg).crossJoin(leakAgg)
      .crossJoin(postExtraAgg).crossJoin(postMissAgg)
      .crossJoin(idxCountAgg).crossJoin(survCountAgg)
      .select(
        (col("extra") === 0 && col("missing") === 0)
          .as("mor_equals_fresh"),
        (col("leaked") === 0).as("deleted_never_surface"),
        (col("p_extra") === 0 && col("p_missing") === 0)
          .as("compact_preserves_search"),
        (col("idx_n") === col("surv_n")).as("compact_rows_ok"),
        lit(untouchedPreserved).as("untouched_cells_preserved"),
        lit(sidecarFolded).as("sidecar_folded"))
  }

  /** E3f: the on-disk IVF index path — build the cell-partitioned
    * index, search it, and assert the result EQUALS the in-memory
    * `ivfTopK` answer exactly (both exceptAll counts zero; vectors
    * round-trip parquet losslessly and tie-breaks are deterministic,
    * so equality — not recall — is the bar), and that the search is
    * non-vacuous. Constant-true oracle (✱). */
  private val e3IvfIndexed: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val cents = ivfTrain(emb, c = 32, iters = 2)
    val path = graft.lake.Lake.scratchDir("ivfidx") + "/index"
    ivfWriteIndex(emb, cents, path)
    val viaIndex = ivfSearchIndex(s, path, queries, cents, k = 5, nprobe = 8)
    val inMemory = ivfTopK(emb, queries, cents, k = 5, nprobe = 8)
    val extraAgg = viaIndex.exceptAll(inMemory).agg(count(lit(1)).as("extra"))
    val missAgg = inMemory.exceptAll(viaIndex).agg(count(lit(1)).as("missing"))
    val nAgg = viaIndex.agg(count(lit(1)).as("n"))
    extraAgg.crossJoin(missAgg).crossJoin(nAgg).select(
      (col("extra") === 0 && col("missing") === 0).as("index_equals_memory"),
      (col("n") > 0).as("nonempty"))
  }

  /** E3e: the PRODUCTION ANN near-dup path, oracle-gated — runs
    * `cosineNearDupViaAnn` and self-checks it in-plan against the exact
    * all-pairs result (the harness subtree):
    *   - recall_ok: found ∩ exact / |exact| ≥ 0.7 (measured 1.0 at the
    *     gate SFs — the ≥-threshold pairs are the closest in the corpus,
    *     so their Hamming distance sits far under τ and their partners
    *     well inside the per-query budget; 0.7 leaves LSH head-room);
    *   - precision_ok: |found| = |found ∩ exact| — exact-cosine
    *     refinement means the output must be a SUBSET of the true pairs,
    *     so any false positive is an arithmetic bug, not LSH noise;
    *   - pair_budget_ok: |found| ≤ budget·n (absolute, not a fraction
    *     of n²).
    * Constant-true oracle (✱ pattern). The exact subtree is the price
    * of the gate; excluded from the default bench via `harnessOnly`. */
  private val e3AnnNearDup: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val found = cosineNearDupViaAnn(emb, threshold = 0.45).localCheckpoint(eager = false)
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val exact = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= 0.45)
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"))
    val hitsAgg = exact.join(found.select(col("a"), col("b")),
        Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val foundAgg = found.agg(count(lit(1)).as("n_found"))
    val nAgg = emb.agg(count(lit(1)).as("n"))
    hitsAgg.crossJoin(totalAgg).crossJoin(foundAgg).crossJoin(nAgg).select(
      // an empty exact set (possible at a tiny SF) is vacuous recall,
      // not a NULL that would hash-mismatch the constant-true oracle
      when(col("total") === 0, lit(true))
        .otherwise(col("hits").cast("double") / col("total") >= 0.7)
        .as("recall_ok"),
      (col("n_found") === col("hits")).as("precision_ok"),
      (col("n_found") <= lit(150L) * col("n")).as("pair_budget_ok"))
  }

  /** E3h: SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication") — semantic
    * dedup by CLUSTER SCOPING: embeddings are Lloyd-clustered (the IVF
    * coarse quantizer reused as the clusterer), candidate pairs form
    * only WITHIN a cluster (equi-join on cell), refined by exact
    * cosine ≥ τ on unit vectors, and the higher id of each surviving
    * pair is dropped. This is the published web-scale recipe: pair
    * work collapses from n²/2 to Σ|cell|²/2 (≈ n²/2C balanced), and
    * the cell equi-join is an ordinary shuffle join — no all-pairs
    * operator anywhere.
    *
    * Boundary loss and its mitigation: the known SemDeDup loss mode is
    * near-dup pairs straddling a cluster boundary, so each vector is
    * MULTI-ASSIGNED to its top-2 cells (the paper's regime — true
    * duplicates at cos ≥ 0.95 — essentially never splits; this
    * synthetic corpus is deliberately weakly clustered with its τ=0.45
    * pair tail close to random directions, the hostile case).
    *
    * Self-check gate (✱, constant-true oracle; clustering is fully
    * deterministic — seed centroids are the lowest-id vectors — so
    * the measured recalls are stable per SF):
    *  - recall ≥ 0.5 of the EXACT all-pairs cosine ≥ τ set (measured
    *    0.57 / 0.79 / 0.63 at sf0.001/0.01/0.1 with C=16, 2 Lloyd
    *    rounds, top-2 assignment);
    *  - precision exact (every emitted pair is in the exact set — the
    *    refinement computes the same unit-vector dot the reference
    *    side does);
    *  - pair budget: examined candidate pairs ≤ n²/4 ABSOLUTE (the
    *    clustering must actually shrink the pair space ≥ 2× even with
    *    double assignment; measured ~6% of all-pairs at sf0.01);
    *  - the drop list only ever names the HIGHER id of a pair (keep
    *    set always contains each group's minimum — checked through
    *    the connected-components operator itself). */
  /** The production SemDeDup dataflow, shared by the oracle-gated
    * harness (`e3_semdedup`) and the bench-visible run
    * (`e3_semdedup_run`): Lloyd-cluster (IVF trainer), top-2 cell
    * multi-assignment, within-cell pair join + exact-cosine refinement.
    * Returns (centroids, assigned, found near-dup pairs with a < b). */
  private def semDedupPairs(emb: DataFrame, c: Int, tau: Double)
      : (Seq[(Int, Seq[Double])], DataFrame, DataFrame) = {
    val cents = ivfTrain(emb, c = c, iters = 2)
    // top-2 cell multi-assignment (ivfProbes over the corpus itself)
    val assigned = ivfProbes(emb, cents, nprobe = 2)
      .select(col("q_id").as("vec_id"), col("qv").as("uv"), col("cell"))
      .localCheckpoint(eager = false)
    val found = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"),
        dot(col("a.uv"), col("b.uv")).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("a"), col("b")).distinct() // a pair can share 2 cells
      .localCheckpoint(eager = false)
    (cents, assigned, found)
  }

  private val e3SemDedup: Q = (s, dir) => {
    val tau = 0.45
    val emb = t(s, dir, "embeddings")
    val (cents, assigned, found) = semDedupPairs(emb, c = 16, tau = tau)
    // Exact reference over the SAME unit vectors — one row per vector
    // (ivfAssign, not the multi-assigned table) — identical arithmetic,
    // so boundary pairs can't flip between the two sides. The
    // verification harness, not the operator's scale path.
    val single = ivfAssign(emb, cents).select(col("vec_id"), col("uv"))
    val exact = single.as("a").join(single.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dot(col("a.uv"), col("b.uv")))
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"))
      .localCheckpoint(eager = false)
    val hitsAgg = exact.join(found, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val foundAgg = found.agg(count(lit(1)).as("n_found"))
    val examinedAgg = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("cn"))
      .agg(sum(col("cn") * (col("cn") - 1) / 2).as("examined"))
    val nAgg = emb.agg(count(lit(1)).as("n"))
    // Representative-survival invariant, checked with the CC operator
    // itself: the drop list is every pair's higher id, so the MINIMUM
    // of each transitive near-dup group must never be dropped (any
    // pair (x, min) would contradict min's minimality). Zero rows =
    // every group keeps its representative.
    val dropped = found.select(col("b")).distinct()
    val droppedRootsAgg = Dedup.connectedComponents(found)
      .groupBy(col("comp")).agg(min(col("id")).as("root"))
      .join(dropped, col("root") === col("b"), "left_semi")
      .agg(count(lit(1)).as("bad_roots"))
    hitsAgg.crossJoin(totalAgg).crossJoin(foundAgg)
      .crossJoin(examinedAgg).crossJoin(nAgg).crossJoin(droppedRootsAgg)
      .select(
        when(col("total") === 0, lit(true))
          .otherwise(col("hits").cast("double") / col("total") >= 0.5)
          .as("recall_ok"),
        (col("n_found") === col("hits")).as("precision_ok"),
        (col("examined") <= col("n") * col("n") / 4).as("pair_budget_ok"),
        (col("bad_roots") === 0).as("representatives_kept_ok"))
  }

  /** E3g: int8 scalar-quantized cosine — the memory/bandwidth path for
    * billion-vector corpora: per-vector symmetric scale s = max|v|/127,
    * codes q = round(v/s) ∈ [−127, 127] (4× smaller than float32, 16×
    * smaller than the double compute form), reconstruction r = q·s.
    * The gate ranks top-3 per query by QUANTIZED cosine and
    * value-checks both the quantized score and its error vs the exact
    * cosine — DuckDB recomputes the identical arithmetic, so a drifted
    * scale, a wrong rounding mode, or a reconstruction bug all
    * hash-mismatch. Map-only compression; the search is the same
    * broadcast-queries shape as the exact scan. */
  private val e3QuantizedCosine: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("sc",
        greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-30))
          / 127.0)
      .withColumn("r", transform(col("v"), x => round(x / col("sc")) * col("sc")))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .withColumn("rn", sqrt(dot(col("r"), col("r"))))
    val q = base.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("r").as("qr"),
        col("n").as("qn"), col("rn").as("qrn"))
    val c = base.select(col("vec_id").as("c_id"), col("v").as("cv"),
      col("r").as("cr"), col("n").as("cn"), col("rn").as("crn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qsim").desc, col("c_id"))
    c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("qsim", dot(col("qr"), col("cr")) / (col("qrn") * col("crn")))
      .withColumn("esim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("qsim"), 6).as("qsim"),
        round(abs(col("qsim") - col("esim")), 4).as("err"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** E3c: embedding-cosine near-duplicate pairs — exact all-pairs,
    * VERIFICATION HARNESS ONLY (the DuckDB oracle recomputes the same
    * cross product; `Bench.harnessOnly` excludes it from timing); the
    * production operator is `cosineNearDupViaAnn`, oracle-gated by
    * `e3_ann_neardup` above and recall-spec-tested against this exact
    * result. Threshold 0.45 sits just under the corpus max (0.513). */
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

  // --------------------------------------------------------- PCA projection

  /** Covariance (centered Gram) matrix in ONE pass as a typed
    * Aggregator: buffer = (flattened d×d running sum, count), reduce
    * adds the outer product of the centered vector, merge is
    * element-wise add — partial aggregation works like a built-in agg,
    * so 100 TB of vectors reduce to d² doubles per partition and ONE
    * d²-sized merge tree; no n×d² explode ever materializes. */
  private def covarianceMatrix(vecs: DataFrame, vecCol: String,
      mean: Seq[Double]): Array[Array[Double]] = {
    import org.apache.spark.sql.expressions.Aggregator
    val d = mean.length
    val agg = new Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
      def zero = (new Array[Double](d * d), 0L)
      def reduce(b: (Array[Double], Long), x: Seq[Float]) = {
        require(x.length == d, s"pca: dimension mismatch (${x.length} vs $d)")
        val c = Array.tabulate(d)(i => x(i) - mean(i))
        var i = 0
        while (i < d) {
          var j = 0
          while (j < d) { b._1(i * d + j) += c(i) * c(j); j += 1 }
          i += 1
        }
        (b._1, b._2 + 1)
      }
      def merge(a: (Array[Double], Long), b: (Array[Double], Long)) = {
        var i = 0
        while (i < d * d) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
      def finish(b: (Array[Double], Long)): Seq[Double] =
        b._1.map(_ / math.max(b._2, 1L)).toSeq
      def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.kryo[Array[Double]],
        org.apache.spark.sql.Encoders.scalaLong)
      def outputEncoder =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }
    val flat = vecs.select(udaf(agg).apply(col(vecCol)).as("g"))
      .head().getSeq[Double](0)
    Array.tabulate(d)(i => Array.tabulate(d)(j => flat(i * d + j)))
  }

  /** Power iteration with deflation — top-`k` eigenpairs of a (tiny,
    * driver-side) symmetric matrix. Deterministic: fixed ramp start
    * vector, fixed iteration count. The d×d matrix is kilobytes; the
    * distributed work stays in [[covarianceMatrix]]. */
  private[ext] def topEigen(m0: Array[Array[Double]], k: Int,
      iters: Int = 500): Seq[(Double, Array[Double])] = {
    val d = m0.length
    var m = m0.map(_.clone())
    (0 until k).map { _ =>
      var v = Array.tabulate(d)(i => 1.0 + i.toDouble / d)
      var lambda = 0.0
      for (_ <- 0 until iters) {
        val mv = Array.tabulate(d)(i =>
          (0 until d).foldLeft(0.0)((s, j) => s + m(i)(j) * v(j)))
        val n = math.sqrt(mv.map(x => x * x).sum)
        v = if (n > 0) mv.map(_ / n) else mv
        lambda = (0 until d).foldLeft(0.0)((s, i) =>
          s + v(i) * (0 until d).foldLeft(0.0)((t, j) => t + m(i)(j) * v(j)))
      }
      // deflate: m ← m − λ v vᵀ
      m = Array.tabulate(d)(i => Array.tabulate(d)(j =>
        m(i)(j) - lambda * v(i) * v(j)))
      (lambda, v)
    }
  }

  /** Project vectors onto literal principal axes — map-only (the
    * centered dot products are codegen'd [[dot]] against literals). */
  def pcaProject(vecs: DataFrame, vecCol: String, mean: Seq[Double],
      axes: Seq[Array[Double]]): DataFrame = {
    val centered = zip_with(asDouble(col(vecCol)), typedlit(mean),
      (a, b) => a - b)
    axes.zipWithIndex.foldLeft(vecs)( { case (df, (v, i)) =>
      df.withColumn(s"pc${i + 1}", dot(centered, typedlit(v.toSeq)))
    })
  }

  /** E3e ✱: PCA via the one-pass covariance aggregator + driver power
    * iteration (d² doubles cross the driver, like IVF training), then
    * a DISTRIBUTED spectral self-check: the projections' empirical
    * variances must match the claimed eigenvalues (±5%), pc1/pc2 must
    * be uncorrelated and centered, and λ₁ ≥ λ₂ — all computed in-plan
    * over the full corpus vs a constant-true oracle, so a wrong
    * eigenvector, a broken aggregator merge, or a bad projection all
    * fail the gate. */
  private val e3Pca: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val d = 64
    val mean = emb.select(posexplode(col("embedding")))
      .groupBy(col("pos")).agg(avg(col("col")).as("m"))
      .orderBy(col("pos")).collect().map(_.getDouble(1)).toSeq
    require(mean.length == d, s"expected $d dims, got ${mean.length}")
    val cov = covarianceMatrix(emb, "embedding", mean)
    val eig = topEigen(cov, 2)
    val Seq((l1, v1), (l2, v2)) = eig
    val proj = pcaProject(emb, "embedding", mean, Seq(v1, v2))
    proj.agg(
      var_pop(col("pc1")).as("var1"), var_pop(col("pc2")).as("var2"),
      covar_pop(col("pc1"), col("pc2")).as("cov12"),
      avg(col("pc1")).as("m1"), count(lit(1)).as("n"))
      .select(
        (abs(col("var1") - l1) <= lit(0.05) * l1).as("var1_matches_l1"),
        (abs(col("var2") - l2) <= lit(0.05) * l2).as("var2_matches_l2"),
        (abs(col("cov12")) <= lit(0.01) * l1).as("uncorrelated"),
        (abs(col("m1")) <= lit(1e-6)).as("centered"),
        lit(l1 >= l2).as("spectrum_ordered"),
        (col("n") > 0).as("nonempty"))
  }

  /** E3f: embedding label coherence — nearest-centroid classification
    * of every vector against its own label set, the standard "are these
    * embeddings any good" diagnostic. Per-label centroids reduce to
    * L×d doubles (driver-bounded, IVF-style), assignment is a map-side
    * argmax against literal centroids (ties → rounded dot then lower
    * label, mirrored in the oracle's ORDER BY), and the per-label
    * accuracy report is one aggregation. Full value-level oracle. */
  private val e3LabelCoherence: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    // Centroid means snap to an 8-decimal grid BEFORE the driver
    // collect: double-sum order differs between engines (and across
    // Spark partitionings), and an unrounded ulp here could flip the
    // 6th decimal of a downstream dot product. Mirrored in the oracle.
    val cents: Seq[(Int, Seq[Double])] = emb
      .select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos")).agg(round(avg(col("col")), 8).as("m"))
      .collect().map(r => (r.getInt(0), (r.getInt(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).map(_._2).toSeq)
      .toSeq.map { case (l, v) => (l, v) }
    val scored = array(cents.sortBy(_._1).map { case (l, cv) =>
      struct(round(dot(col("v"), typedlit(cv)), 6).as("d"),
        lit(-l).as("neg_label"))
    }: _*)
    emb.withColumn("best", -array_max(scored).getField("neg_label"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("best") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n"), 4).as("acc"))
      .orderBy(col("label"))
  }

  /** E3i: the PRODUCTION signature-scan near-dup search, bench-visible.
    * `e3_ann_neardup` gates this path against the exact all-pairs
    * baseline in Verify, but that harness subtree dominates its cost,
    * so the whole entry is bench-excluded — a perf regression in the
    * production search would never reach a BENCH artifact. This entry
    * times `cosineNearDupViaAnn` ALONE; the self-checks are cheap
    * output invariants (absolute pair budget, canonical a < b
    * orientation, refined sims inside [τ, 1]) against a constant-true
    * oracle. Correctness of the search stays `e3_ann_neardup`'s job. */
  /** Sharded-HNSW top-k: each shard builds its partition-local
    * [[HnswIndex]] (insertion in ascending vec_id — the determinism
    * contract), the bounded query set broadcasts, every shard answers
    * top-k from its graph, and a per-query window merges shard answers
    * into the global top-k. This is the standard production layout for
    * graph ANN (construction is inherently sequential per shard, so
    * the graph lives where the vectors live); state is bounded by the
    * shard, never the corpus, and the only driver data is |Q| query
    * vectors (the bounded-collect convention shared with the IVF probe
    * lists). Emits per-shard degree-audit columns so the gate can
    * assert the M_max invariants over every shard in-plan. */
  def hnswTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, efConstruction: Int = 64, efSearch: Int = 64,
      shards: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr = queries
      .select(col("vec_id"), asDouble(col("embedding")))
      .as[(Long, Array[Double])].collect().sortBy(_._1) // bounded |Q|
    val bc = spark.sparkContext.broadcast(qArr)
    val perShard = corpus
      .select(col("vec_id"), asDouble(col("embedding")))
      .repartition(shards, col("vec_id"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val rows = it.toArray.sortBy(_._1)
        if (rows.isEmpty) Iterator.empty
        else {
          val idx = new HnswIndex(m, efConstruction)
          rows.foreach { case (id, v) => idx.insert(id, v) }
          val deg0 = idx.maxDegree0
          val degU = idx.maxDegreeUpper
          // routing probe: every node must find ITSELF at rank 1 —
          // an unreachable or mis-linked region fails this, which a
          // recall spot-check over 50 queries could miss. ef=16: at
          // ef=8 the greedy level-0 entry leaves ~1-2 nodes per 500
          // behind a narrow-beam horizon (inherent approximate
          // routing, measured at sf0.1), while a DISCONNECTED region
          // stays unreachable at any ef — the probe targets the
          // latter.
          var selfFound = 0
          rows.foreach { case (id, v) =>
            if (idx.search(v, ef = 16, k = 1).headOption.exists(_._1 == id))
              selfFound += 1
          }
          bc.value.iterator.flatMap { case (qid, qv) =>
            idx.search(qv, efSearch, k + 1).map { case (cid, sim) =>
              (qid, cid, sim, rows.length, selfFound, deg0, degU)
            }
          }
        }
      }
      .toDF("q_id", "c_id", "sim", "shard_n", "shard_self_found",
        "deg0", "deg_upper")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("c_id"))
    perShard.filter(col("c_id") =!= col("q_id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("sim"), 6).as("sim"),
        col("shard_n"), col("shard_self_found"),
        col("deg0"), col("deg_upper"))
  }

  /** One persisted-HNSW state row: (shard, id, level, normalized
    * vector, per-level neighbor ids). */
  private type HnswRow = (Int, Long, Int, Array[Double], Array[Array[Long]])

  /** Build per-shard graphs and persist them — one row per node, the
    * adjacency inline (id-keyed, so rows are order-independent on
    * disk). Shard = Spark's own hash-partition index for vec_id, which
    * `pmod(hash(vec_id), shards)` reproduces exactly — the routing
    * contract incremental ingest relies on. */
  def hnswWriteIndex(corpus: DataFrame, path: String, m: Int = 8,
      efConstruction: Int = 64, shards: Int = 4): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col("vec_id"), asDouble(col("embedding")))
      .repartition(shards, col("vec_id"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val rows = it.toArray.sortBy(_._1)
        if (rows.isEmpty) Iterator.empty
        else {
          val shard = org.apache.spark.TaskContext.getPartitionId()
          val idx = new HnswIndex(m, efConstruction)
          rows.foreach { case (id, v) => idx.insert(id, v) }
          idx.exportRows.map { case (id, lvl, vec, nbrs) =>
            (shard, id, lvl, vec, nbrs)
          }
        }
      }
      .toDF("shard", "id", "level", "vec", "nbrs")
      .write.mode("overwrite").parquet(path)
  }

  /** Ingest a batch into the persisted graphs WITHOUT a rebuild —
    * HNSW insertion is incremental by construction, so each shard
    * rebuilds its graph object from the stored rows, inserts its
    * arriving slice (ascending id — deterministic), and exports the
    * grown graph to a NEW version directory (never read-overwrite).
    * Arrivals route by the same `pmod(hash(vec_id), shards)` the
    * writer used, so every vector lands in its home shard. */
  def hnswIngest(s: SparkSession, path: String, arriving: DataFrame,
      outPath: String, m: Int = 8, efConstruction: Int = 64,
      shards: Int = 4): Unit = {
    import s.implicits._
    val state = s.read.parquet(path).as[HnswRow]
    val arr = arriving
      .select(pmod(hash(col("vec_id")), lit(shards)).as("shard"),
        col("vec_id"), asDouble(col("embedding")))
      .as[(Int, Long, Array[Double])]
    state.groupByKey(_._1)
      .cogroup(arr.groupByKey(_._1)) { (shard, stateIt, arrIt) =>
        val rows = stateIt.map(r => (r._2, r._3, r._4, r._5)).toSeq
        val idx = HnswIndex.fromRows(m, efConstruction, rows)
        arrIt.toArray.sortBy(_._2).foreach { case (_, id, v) =>
          idx.insert(id, v)
        }
        idx.exportRows.map { case (id, lvl, vec, nbrs) =>
          (shard, id, lvl, vec, nbrs)
        }
      }
      .toDF("shard", "id", "level", "vec", "nbrs")
      .write.mode("overwrite").parquet(outPath)
  }

  /** Search the persisted graphs: per-shard rebuild + beam answer +
    * global top-k merge — [[hnswTopK]]'s exact dataflow with the build
    * step replaced by the stored rows. `deleted` is the tombstone
    * sidecar (soft deletes, the hnswlib/FAISS convention: tombstoned
    * nodes keep ROUTING but never surface as results — graph repair is
    * a compaction-time rebuild); each shard over-fetches by the
    * tombstone count so k survivors remain after the filter. */
  def hnswSearchIndex(s: SparkSession, path: String, queries: DataFrame,
      k: Int, m: Int = 8, efConstruction: Int = 64, efSearch: Int = 64,
      deleted: Set[Long] = Set.empty): DataFrame = {
    import s.implicits._
    val qArr = queries
      .select(col("vec_id"), asDouble(col("embedding")))
      .as[(Long, Array[Double])].collect().sortBy(_._1) // bounded |Q|
    val bc = s.sparkContext.broadcast(qArr)
    val bcDel = s.sparkContext.broadcast(deleted)
    val fetch = k + 1 + deleted.size // self + tombstone over-fetch
    val perShard = s.read.parquet(path).as[HnswRow]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.map(r => (r._2, r._3, r._4, r._5)).toSeq
        val idx = HnswIndex.fromRows(m, efConstruction, rows)
        val del = bcDel.value
        bc.value.iterator.flatMap { case (qid, qv) =>
          idx.search(qv, math.max(efSearch, fetch), fetch)
            .filterNot { case (cid, _) => del.contains(cid) }
            .map { case (cid, sim) => (qid, cid, sim) }
        }
      }
      .toDF("q_id", "c_id", "sim")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("c_id"))
    perShard.filter(col("c_id") =!= col("q_id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"),
        round(col("sim"), 6).as("sim"))
  }

  /** E3k2 ✱: persisted-HNSW search must EQUAL the in-memory path —
    * same shards, same graphs, same beam, so the round-trip through
    * parquet (nested adjacency included) is exact row equality, not a
    * recall bound. */
  private val e3HnswIndexed: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val path = graft.lake.Lake.scratchDir("e3_hnsw") + "/index"
    hnswWriteIndex(emb, path)
    val viaIndex = hnswSearchIndex(s, path, queries, k = 5)
      .localCheckpoint(eager = false)
    val inMemory = hnswTopK(emb, queries, k = 5)
      .select(col("q_id"), col("rnk"), col("c_id"), col("sim"))
    val extra = viaIndex.exceptAll(inMemory).agg(count(lit(1)).as("x"))
    val miss = inMemory.exceptAll(viaIndex).agg(count(lit(1)).as("y"))
    val nAgg = viaIndex.agg(count(lit(1)).as("n"))
    extra.crossJoin(miss).crossJoin(nAgg).select(
      (col("x") === 0 && col("y") === 0).as("index_equals_memory"),
      (col("n") > 0).as("nonempty"))
  }

  /** E3k3 ✱: incremental ingest into the persisted graphs — the
    * held-out quarter inserts into the loaded shard graphs (no
    * rebuild, new version dir), and the grown index must hold every
    * vector exactly once, keep the M_max degree invariants, and reach
    * brute-force recall ≥ 0.8 over the FULL corpus (the grown graph's
    * insertion order differs from a fresh build's, so equality is not
    * the contract — recall is). */
  private val e3HnswIncremental: Q = (s, dir) => {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val resident = emb.filter(col("vec_id") % 4 =!= 0)
    val arriving = emb.filter(col("vec_id") % 4 === 0)
    val queries = emb.filter(col("vec_id") < 50)
    val root = graft.lake.Lake.scratchDir("e3_hnsw_inc")
    hnswWriteIndex(resident, s"$root/v1")
    hnswIngest(s, s"$root/v1", arriving, s"$root/v2")
    val grown = s.read.parquet(s"$root/v2")
    val viaIndex = hnswSearchIndex(s, s"$root/v2", queries, k = 5)
      .localCheckpoint(eager = false)
    val exact = bruteForceTopK(queries, emb, k = 5)
      .select(col("q_id"), col("c_id"))
    val hitsAgg = exact.join(viaIndex.select(col("q_id"), col("c_id")),
        Seq("q_id", "c_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val nodeAgg = grown.agg(count(lit(1)).as("n_nodes"),
      countDistinct(col("id")).as("n_ids"))
    val degAgg = grown.select(
        size(element_at(col("nbrs"), 1)).as("d0"),
        greatest(lit(0), array_max(transform(
          slice(col("nbrs"), lit(2), lit(100)), a => size(a))))
          .as("du"))
      .agg(max(col("d0")).as("max_d0"), max(col("du")).as("max_du"))
    val cAgg = emb.agg(count(lit(1)).as("n_corpus"))
    hitsAgg.crossJoin(totalAgg).crossJoin(nodeAgg).crossJoin(degAgg)
      .crossJoin(cAgg).select(
        (col("hits").cast("double") / col("total") >= 0.8)
          .as("recall_ok"),
        (col("n_nodes") === col("n_corpus") &&
          col("n_ids") === col("n_corpus")).as("all_vectors_present"),
        (col("max_d0") <= 16 && col("max_du") <= 8)
          .as("degree_bounds_ok"))
  }

  /** E3k4 ✱: tombstone deletes on the persisted graphs — soft
    * deletes: tombstoned ids keep routing, never surface; every
    * query still gets k results (over-fetch covers the tombstones)
    * and recall holds ≥ 0.8 against brute force over SURVIVORS. */
  private val e3HnswDelete: Q = (s, dir) => {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val path = graft.lake.Lake.scratchDir("e3_hnsw_del") + "/index"
    hnswWriteIndex(emb, path)
    val delIds = emb.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id")).as[Long].collect().toSet // bounded batch
    val survivors = emb.filter(col("vec_id") % 10 =!= 7)
    val viaIndex = hnswSearchIndex(s, path, queries, k = 5,
      deleted = delIds).localCheckpoint(eager = false)
    val exact = bruteForceTopK(queries, survivors, k = 5)
      .select(col("q_id"), col("c_id"))
    val hitsAgg = exact.join(viaIndex.select(col("q_id"), col("c_id")),
        Seq("q_id", "c_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val badAgg = viaIndex
      .filter(col("c_id") % 10 === 7)
      .agg(count(lit(1)).as("n_deleted_surfaced"))
    val perQAgg = viaIndex.groupBy(col("q_id"))
      .agg(count(lit(1)).as("per_q"))
      .agg(min(col("per_q")).as("min_per_q"))
    hitsAgg.crossJoin(totalAgg).crossJoin(badAgg).crossJoin(perQAgg)
      .select(
        (col("n_deleted_surfaced") === 0).as("no_deleted_results"),
        (col("min_per_q") === 5).as("k_results_ok"),
        (col("hits").cast("double") / col("total") >= 0.8)
          .as("recall_ok"))
  }

  /** E3k ✱: HNSW recall + structure gate — brute-force baseline
    * recall ≥ 0.9, every shard's level-0 degree ≤ 2M and upper-level
    * degree ≤ M (the paper's M_max invariants, asserted over EVERY
    * shard), and the per-shard self-routing probe: each inserted node
    * finds itself at rank 1, so no graph region is unreachable. */
  private val e3HnswRecall: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = bruteForceTopK(queries, emb, k = 5)
      .select(col("q_id"), col("c_id"))
    val via = hnswTopK(emb, queries, k = 5).localCheckpoint(eager = false)
    val hitsAgg = exact.join(via.select(col("q_id"), col("c_id")),
        Seq("q_id", "c_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val structAgg = via.agg(
      max(col("deg0")).as("max_deg0"),
      max(col("deg_upper")).as("max_deg_upper"),
      sum(when(col("shard_self_found") === col("shard_n"), 0L)
        .otherwise(1L)).as("bad_shards"))
    hitsAgg.crossJoin(totalAgg).crossJoin(structAgg).select(
      (col("hits").cast("double") / col("total") >= 0.9).as("recall_ok"),
      (col("max_deg0") <= 16 && col("max_deg_upper") <= 8)
        .as("degree_bounds_ok"),
      (col("bad_shards") === 0).as("self_routing_ok"))
  }

  /** E3l ✱: the bench-visible HNSW search (build + fan-out + merge)
    * without the brute-force baseline subtree. Cheap invariants only:
    * every query answered, ≤ k per query, ranks in [1, k], sims in
    * [−1, 1]. */
  private val e3HnswSearch: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val res = hnswTopK(emb, queries, k = 5)
    val qAgg = queries.agg(count(lit(1)).as("nq"))
    res.groupBy(col("q_id"))
      .agg(count(lit(1)).as("per_q"), max(col("rnk")).as("mr"),
        min(col("sim")).as("mns"), max(col("sim")).as("mxs"))
      .agg(count(lit(1)).as("answered"), max(col("per_q")).as("max_per_q"),
        max(col("mr")).as("max_rank"), min(col("mns")).as("min_sim"),
        max(col("mxs")).as("max_sim"))
      .crossJoin(qAgg)
      .select(
        (col("answered") === col("nq")).as("all_queries_answered"),
        (col("max_per_q") <= 5 && col("max_rank") <= 5).as("k_bounded"),
        (col("min_sim") >= -1.000001 && col("max_sim") <= 1.000001)
          .as("sims_in_range_ok"))
  }

  private val e3AnnSearch: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val found = cosineNearDupViaAnn(emb, threshold = 0.45)
      .localCheckpoint(eager = false)
    val nAgg = emb.agg(count(lit(1)).as("n"))
    found.agg(
      count(lit(1)).as("n_found"),
      sum(when(col("a") < col("b"), 0L).otherwise(1L)).as("bad_orient"),
      sum(when(col("sim").between(0.45, 1.000001), 0L).otherwise(1L))
        .as("bad_sim"))
      .crossJoin(nAgg)
      .select(
        (col("n_found") <= lit(150L) * col("n")).as("pair_budget_ok"),
        (coalesce(col("bad_orient"), lit(0L)) === 0).as("orientation_ok"),
        (coalesce(col("bad_sim"), lit(0L)) === 0).as("sims_in_range_ok"))
  }

  /** E3j: the PRODUCTION IVF search (train + assign + probe + ranked
    * cell-scoped cosine), bench-visible — the same dataflow
    * `e3_ivf_recall` gates, without its exact-top-k baseline and
    * scanned-volume audit subtrees. Cheap invariants only: every query
    * answered, ≤ k results per query, ranks within [1, k]. */
  private val e3IvfSearch: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val cents = ivfTrain(emb, c = 32, iters = 2)
    val res = ivfTopK(emb, queries, cents, k = 5, nprobe = 8)
    val qAgg = queries.agg(count(lit(1)).as("nq"))
    res.groupBy(col("q_id"))
      .agg(count(lit(1)).as("per_q"), max(col("rnk")).as("mr"))
      .agg(count(lit(1)).as("answered"), max(col("per_q")).as("max_per_q"),
        max(col("mr")).as("max_rnk"))
      .crossJoin(qAgg)
      .select(
        (col("answered") === col("nq")).as("all_queries_answered"),
        (col("max_per_q") <= 5).as("k_bounded"),
        (col("max_rnk") <= 5).as("rank_bounded"))
  }

  /** E3g: PQ self-check — recall of the exact top-5 through the
    * ADC-scan-plus-rerank path must clear 0.5 (measured ≈ 0.80 at
    * sf0.1, ≈ 0.9+ at sf0.01), every emitted code must lie in [0, ksub), and the
    * re-rank candidate set must respect its absolute budget (≤
    * rerank·|queries| exact re-scores — the "compressed scan did the
    * winnowing" line). Emits booleans for the constant oracle (✱);
    * the exact-top-k baseline is the harness — bench-excluded, the
    * production path benches as `e3_pq_search`. */
  private val e3PqRecall: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val books = pqTrain(emb, m = 8, ksub = 32, iters = 2)
    val exact = bruteForceTopK(queries, emb, k = 5)
      .select(col("q_id"), col("c_id"))
    val found = pqSearch(emb, queries, books, k = 5, rerank = 100)
      .localCheckpoint(eager = false)
    val hitsAgg = exact.join(found.select(col("q_id"), col("c_id")),
        Seq("q_id", "c_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val codeAgg = pqEncode(emb, books)
      .select(explode(col("codes")).as("cd"))
      .agg(sum(when(col("cd").between(0, 31), 0L).otherwise(1L))
        .as("bad_codes"))
    val perQAgg = found.groupBy(col("q_id"))
      .agg(count(lit(1)).as("per_q"))
      .agg(max(col("per_q")).as("max_per_q"))
    hitsAgg.crossJoin(totalAgg).crossJoin(codeAgg).crossJoin(perQAgg)
      .select(
        (col("hits").cast("double") / col("total") >= 0.5).as("recall_ok"),
        (coalesce(col("bad_codes"), lit(0L)) === 0).as("codes_in_range_ok"),
        (col("max_per_q") <= 5).as("k_bounded"))
  }

  /** E3n: the on-disk PQ index path — write the (vec_id, codes) table,
    * search it, and assert the result EQUALS the in-memory `pqSearch`
    * answer exactly (codes are deterministic given the codebook and
    * ints round-trip parquet losslessly — equality, not recall, is the
    * bar), and that the search is non-vacuous. Constant-true
    * oracle (✱). */
  private val e3PqIndexed: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val books = pqTrain(emb, m = 8, ksub = 32, iters = 2)
    val path = graft.lake.Lake.scratchDir("pqidx") + "/index"
    pqWriteIndex(emb, books, path)
    val viaIndex = pqSearchIndex(s, path, emb, queries, books,
      k = 5, rerank = 100)
    val inMemory = pqSearch(emb, queries, books, k = 5, rerank = 100)
    val extraAgg = viaIndex.exceptAll(inMemory).agg(count(lit(1)).as("extra"))
    val missAgg = inMemory.exceptAll(viaIndex).agg(count(lit(1)).as("missing"))
    val nAgg = viaIndex.agg(count(lit(1)).as("n"))
    extraAgg.crossJoin(missAgg).crossJoin(nAgg).select(
      (col("extra") === 0 && col("missing") === 0).as("index_equals_memory"),
      (col("n") > 0).as("nonempty"))
  }

  /** E3h: IVF-PQ self-check — the composed IVFADC path must clear the
    * same bars as its two parents: recall of the exact top-5 ≥ 0.5
    * (bounded above by the IVF probe recall ≈ 0.83; the residual-ADC
    * ranking inside probed cells costs a few points on this hostile
    * corpus), and the probed-cell scan budget ≤ half the corpus.
    * Constant-true oracle (✱); harness-excluded from the bench —
    * `e3_ivfpq_search` times the production dataflow. */
  private val e3IvfPqRecall: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val cents = ivfTrain(emb, c = 32, iters = 2)
    val books = ivfPqTrain(emb, cents, m = 8, ksub = 32, iters = 2)
    val exact = bruteForceTopK(queries, emb, k = 5)
      .select(col("q_id"), col("c_id"))
    val found = ivfPqSearch(emb, queries, cents, books,
        k = 5, nprobe = 8, rerank = 100)
      .select(col("q_id"), col("c_id"))
    val hitsAgg = exact.join(found, Seq("q_id", "c_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    val cellSizes = ivfAssign(emb, cents).groupBy(col("cell"))
      .agg(count(lit(1)).as("sz"))
    val scanAgg = ivfProbes(queries, cents, nprobe = 8)
      .select(col("q_id"), col("cell")).join(cellSizes, Seq("cell"))
      .groupBy(col("q_id")).agg(sum(col("sz")).as("scanned"))
      .agg(max(col("scanned")).as("max_scanned"))
    val nAgg = emb.agg(count(lit(1)).as("n"))
    hitsAgg.crossJoin(totalAgg).crossJoin(scanAgg).crossJoin(nAgg).select(
      (col("hits").cast("double") / col("total") >= 0.5).as("recall_ok"),
      (col("max_scanned") <= col("n") / 2).as("scan_budget_ok"))
  }

  /** E3m: the PRODUCTION IVF-PQ search, bench-visible — the composed
    * train + assign + residual-encode + probed ADC scan + re-rank
    * without the exact baseline/scan-audit subtrees. */
  private val e3IvfPqSearch: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val cents = ivfTrain(emb, c = 32, iters = 2)
    val books = ivfPqTrain(emb, cents, m = 8, ksub = 32, iters = 2)
    val res = ivfPqSearch(emb, queries, cents, books,
      k = 5, nprobe = 8, rerank = 100)
    val qAgg = queries.agg(count(lit(1)).as("nq"))
    res.groupBy(col("q_id"))
      .agg(count(lit(1)).as("per_q"), max(col("rnk")).as("mr"))
      .agg(count(lit(1)).as("answered"), max(col("per_q")).as("max_per_q"),
        max(col("mr")).as("max_rnk"))
      .crossJoin(qAgg)
      .select(
        (col("answered") === col("nq")).as("all_queries_answered"),
        (col("max_per_q") <= 5).as("k_bounded"),
        (col("max_rnk") <= 5).as("rank_bounded"))
  }

  /** E3l: the PRODUCTION PQ search (train + encode + ADC scan +
    * rerank), bench-visible — `e3_pq_recall`'s dataflow without its
    * exact-top-k baseline subtree. Cheap invariants only: every query
    * answered, ≤ k results per query, ranks within [1, k], sims in
    * [−1, 1]. */
  private val e3PqSearch: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val books = pqTrain(emb, m = 8, ksub = 32, iters = 2)
    val res = pqSearch(emb, queries, books, k = 5, rerank = 100)
    val qAgg = queries.agg(count(lit(1)).as("nq"))
    res.groupBy(col("q_id"))
      .agg(count(lit(1)).as("per_q"), max(col("rnk")).as("mr"),
        max(abs(col("sim"))).as("ma"))
      .agg(count(lit(1)).as("answered"), max(col("per_q")).as("max_per_q"),
        max(col("mr")).as("max_rnk"), max(col("ma")).as("max_abs_sim"))
      .crossJoin(qAgg)
      .select(
        (col("answered") === col("nq")).as("all_queries_answered"),
        (col("max_per_q") <= 5).as("k_bounded"),
        (col("max_rnk") <= 5).as("rank_bounded"),
        (col("max_abs_sim") <= 1.000001).as("sims_in_range_ok"))
  }

  /** E3k: the PRODUCTION SemDeDup run (cluster, multi-assign,
    * within-cell refine, drop list), bench-visible — `e3_semdedup`'s
    * dataflow via [[semDedupPairs]] without the exact all-pairs
    * baseline or the connected-components representative audit. Cheap
    * invariants: the clustering actually shrank the pair space (≤ n²/4
    * examined, absolute) and the drop list keeps at least one
    * survivor. */
  private val e3SemDedupRun: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val (_, assigned, found) = semDedupPairs(emb, c = 16, tau = 0.45)
    val examinedAgg = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("cn"))
      .agg(sum(col("cn") * (col("cn") - 1) / 2).as("examined"))
    val nAgg = emb.agg(count(lit(1)).as("n"))
    val dropAgg = found.select(col("b")).distinct()
      .agg(count(lit(1)).as("n_dropped"))
    dropAgg.crossJoin(examinedAgg).crossJoin(nAgg).select(
      (col("examined") <= col("n") * col("n") / 4).as("pair_budget_ok"),
      (col("n_dropped") < col("n")).as("kept_nonempty"))
  }

  /** E3: retrieval-quality evaluation — precision@10, MRR, and average
    * precision for the exact cosine retriever with relevance = shared
    * class label (the standard labeled-corpus eval a pipeline runs
    * before swapping retrievers). Every metric is a small-denominator
    * rational: AP sums per-rank micro-ints (round(10⁶·hits_k/k), k ≤ 10
    * — no .5 can occur) so cross-engine addition order cannot move the
    * 4th decimal. Gate-SF exact scan; at 100 TB the ranked lists come
    * from the gated ANN indexes and the evaluator consumes |Q|·k rows
    * regardless of corpus size. */
  private val e3EvalRank: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val labels = emb.select(col("vec_id"), col("label"))
    val judged = bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 10)
      .join(labels.select(col("vec_id").as("q_id"),
        col("label").as("q_label")), "q_id")
      .join(labels.select(col("vec_id").as("c_id"),
        col("label").as("c_label")), "c_id")
      .withColumn("rel",
        when(col("q_label") === col("c_label"), 1L).otherwise(0L))
    val cum = Window.partitionBy(col("q_id")).orderBy(col("rnk"))
    judged.withColumn("hits_k", sum(col("rel")).over(cum))
      .withColumn("ap_term",
        when(col("rel") === 1,
          round(col("hits_k") * 1000000.0 / col("rnk"), 0).cast("long"))
          .otherwise(0L))
      .groupBy(col("q_id")).agg(
        sum(col("rel")).as("n_hits"),
        round(sum(col("rel")) / 10.0, 4).as("prec10"),
        round(coalesce(
          lit(1.0) / min(when(col("rel") === 1, col("rnk"))),
          lit(0.0)), 4).as("mrr"),
        sum(col("ap_term")).as("ap_micro"))
      .orderBy(col("q_id"))
  }

  val queries: Map[String, Q] = Map(
    "e3_eval_rank" -> e3EvalRank,
    "e3_hybrid_rrf" -> e3HybridRrf,
    "e3_matryoshka" -> e3Matryoshka,
    "e3_semdedup" -> e3SemDedup,
    "e3_pq_recall" -> e3PqRecall,
    "e3_pq_search" -> e3PqSearch,
    "e3_ivfpq_recall" -> e3IvfPqRecall,
    "e3_ivfpq_search" -> e3IvfPqSearch,
    "e3_pq_indexed" -> e3PqIndexed,
    "e3_ann_search" -> e3AnnSearch,
    "e3_hnsw_recall" -> e3HnswRecall,
    "e3_hnsw_search" -> e3HnswSearch,
    "e3_hnsw_indexed" -> e3HnswIndexed,
    "e3_hnsw_incremental" -> e3HnswIncremental,
    "e3_hnsw_delete" -> e3HnswDelete,
    "e3_ivf_search" -> e3IvfSearch,
    "e3_semdedup_run" -> e3SemDedupRun,
    "e3_label_coherence" -> e3LabelCoherence,
    "e3_pca" -> e3Pca,
    "e3_cosine_topk" -> e3CosineTopk,
    "e3_mips_topk" -> e3MipsTopk,
    "e3_mips_ann" -> e3MipsAnn,
    "e3_knn_classify" -> e3KnnClassify,
    "e3_ann_recall" -> e3AnnRecall,
    "e3_ivf_recall" -> e3IvfRecall,
    "e3_ivf_indexed" -> e3IvfIndexed,
    "e3_ivf_incremental" -> e3IvfIncremental,
    "e3_ivf_rebalance" -> e3IvfRebalance,
    "e3_ivf_delete" -> e3IvfDelete,
    "e3_ivfpq_delete" -> e3IvfPqDelete,
    "e3_ivfpq_incremental" -> e3IvfPqIncremental,
    "e3_ann_neardup" -> e3AnnNearDup,
    "e3_cosine_neardup" -> e3CosineNearDup,
    "e3_quantized_cosine" -> e3QuantizedCosine,
    "e3_hard_negatives" -> e3HardNegatives,
  )

  val oracles: Map[String, String] = Map(
    // Exact cosine ranking restated (the e3_cosine_topk recipe), then
    // the same rational metrics: double-literal divisions only, AP as
    // micro-int sums — addition order can't move the hash.
    "e3_eval_rank" ->
      """WITH n AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[],
        |                          embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS q_id, q.label AS q_label,
        |    c.vec_id AS c_id, c.label AS c_label,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |r AS (
        |  SELECT q_id,
        |    CASE WHEN q_label = c_label THEN 1 ELSE 0 END AS rel,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, c_id) AS rnk
        |  FROM p),
        |t AS (
        |  SELECT q_id, rnk, rel,
        |    sum(rel) OVER (PARTITION BY q_id ORDER BY rnk) AS hits_k
        |  FROM r WHERE rnk <= 10)
        |SELECT q_id,
        |  sum(rel)::BIGINT AS n_hits,
        |  round(sum(rel)::DOUBLE / 10.0, 4) AS prec10,
        |  round(coalesce(
        |    1.0::DOUBLE / min(CASE WHEN rel = 1 THEN rnk END),
        |    0.0), 4) AS mrr,
        |  sum(CASE WHEN rel = 1
        |      THEN round(hits_k * 1e6 / rnk, 0)::BIGINT
        |      ELSE 0 END)::BIGINT AS ap_micro
        |FROM t GROUP BY q_id ORDER BY q_id""".stripMargin,
    // Both rankings recomputed on the sliced list; bruteForceTopK's
    // exact double arithmetic mirrored per the e3_cosine_topk shape.
    "e3_matryoshka" ->
      """WITH n16 AS (
        |  SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v
        |  FROM embeddings),
        |s16 AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
        |  FROM n16),
        |p16 AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM s16 q, s16 c
        |  WHERE q.vec_id % 167 = 3 AND c.vec_id <> q.vec_id),
        |short AS (
        |  SELECT q_id, c_id, cos, rnk FROM (
        |    SELECT q_id, c_id, cos,
        |      row_number() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, c_id) AS rnk
        |    FROM p16) WHERE rnk <= 5),
        |nf AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[],
        |      embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |pf AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM nf q, nf c
        |  WHERE q.vec_id % 167 = 3 AND c.vec_id <> q.vec_id),
        |full5 AS (
        |  SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id,
        |      row_number() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, c_id) AS rnk
        |    FROM pf) WHERE rnk <= 5),
        |ov AS (
        |  SELECT s.q_id, count(*)::BIGINT AS overlap5
        |  FROM short s JOIN full5 f
        |    ON s.q_id = f.q_id AND s.c_id = f.c_id
        |  GROUP BY s.q_id)
        |SELECT s.q_id, s.rnk, s.c_id, round(s.cos, 6) AS sim,
        |  coalesce(o.overlap5, 0)::BIGINT AS overlap5
        |FROM short s LEFT JOIN ov o ON s.q_id = o.q_id
        |ORDER BY s.q_id, s.rnk""".stripMargin,
    // Full restatement of both retrievers and the fusion: the lexical
    // Jaccard uses the same inter/(na+nb-inter) spelling as the native
    // JaccardSim kernel, the dense side the e3_cosine_topk shape, and
    // the RRF arithmetic is the identical double expression.
    "e3_hybrid_rrf" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
        |      i -> string_split(text,' ')[i] || ' ' ||
        |           string_split(text,' ')[i+1] || ' ' ||
        |           string_split(text,' ')[i+2])) AS s
        |  FROM documents),
        |lexp AS (
        |  SELECT q.doc_id AS q_id, c.doc_id AS c_id,
        |    len(list_intersect(q.s, c.s))::DOUBLE
        |      / (len(q.s) + len(c.s) - len(list_intersect(q.s, c.s)))
        |      AS jac
        |  FROM sh q, sh c
        |  WHERE q.doc_id % 167 = 3 AND c.doc_id <> q.doc_id),
        |lx AS (
        |  SELECT q_id, c_id, rnk FROM (
        |    SELECT q_id, c_id,
        |      row_number() OVER (PARTITION BY q_id
        |        ORDER BY jac DESC, c_id) AS rnk
        |    FROM lexp) WHERE rnk <= 20),
        |n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[],
        |      embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |denp AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM n q, n c
        |  WHERE q.vec_id % 167 = 3 AND c.vec_id <> q.vec_id),
        |dn AS (
        |  SELECT q_id, c_id, rnk FROM (
        |    SELECT q_id, c_id,
        |      row_number() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, c_id) AS rnk
        |    FROM denp) WHERE rnk <= 20),
        |f AS (
        |  SELECT coalesce(l.q_id, d.q_id) AS q_id,
        |    coalesce(l.c_id, d.c_id) AS c_id,
        |    l.rnk AS lex_rank, d.rnk AS dense_rank,
        |    coalesce(1.0::DOUBLE / (60 + l.rnk), 0.0)
        |      + coalesce(1.0::DOUBLE / (60 + d.rnk), 0.0) AS rrf
        |  FROM lx l FULL JOIN dn d
        |    ON l.q_id = d.q_id AND l.c_id = d.c_id)
        |SELECT q_id, rnk, c_id, round(rrf, 6) AS rrf,
        |  coalesce(lex_rank, 0)::BIGINT AS lex_rank,
        |  coalesce(dense_rank, 0)::BIGINT AS dense_rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY rrf DESC, c_id) AS rnk FROM f)
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "e3_hard_negatives" ->
      """WITH n AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS q_id, q.label AS q_label,
        |    c.vec_id AS c_id, c.label AS c_label,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM n q, n c
        |  WHERE q.vec_id < 8 AND q.label <> c.label),
        |r AS (
        |  SELECT q_id, q_label, c_id, c_label, cos,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, c_id) AS rnk
        |  FROM p)
        |SELECT q_id, q_label, rnk, c_id, c_label, round(cos, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "e3_pq_recall" ->
      """SELECT true AS recall_ok, true AS codes_in_range_ok,
        |  true AS k_bounded""".stripMargin,
    "e3_ivfpq_recall" ->
      """SELECT true AS recall_ok, true AS scan_budget_ok""".stripMargin,
    "e3_pq_indexed" ->
      """SELECT true AS index_equals_memory, true AS nonempty""".stripMargin,
    "e3_ivfpq_search" ->
      """SELECT true AS all_queries_answered, true AS k_bounded,
        |  true AS rank_bounded""".stripMargin,
    "e3_pq_search" ->
      """SELECT true AS all_queries_answered, true AS k_bounded,
        |  true AS rank_bounded, true AS sims_in_range_ok""".stripMargin,
    "e3_ann_search" ->
      """SELECT true AS pair_budget_ok, true AS orientation_ok,
        |  true AS sims_in_range_ok""".stripMargin,
    "e3_hnsw_recall" ->
      """SELECT true AS recall_ok, true AS degree_bounds_ok,
        |  true AS self_routing_ok""".stripMargin,
    "e3_hnsw_indexed" ->
      """SELECT true AS index_equals_memory, true AS nonempty""".stripMargin,
    "e3_hnsw_incremental" ->
      """SELECT true AS recall_ok, true AS all_vectors_present,
        |  true AS degree_bounds_ok""".stripMargin,
    "e3_hnsw_delete" ->
      """SELECT true AS no_deleted_results, true AS k_results_ok,
        |  true AS recall_ok""".stripMargin,
    "e3_hnsw_search" ->
      """SELECT true AS all_queries_answered, true AS k_bounded,
        |  true AS sims_in_range_ok""".stripMargin,
    "e3_ivf_search" ->
      """SELECT true AS all_queries_answered, true AS k_bounded,
        |  true AS rank_bounded""".stripMargin,
    "e3_semdedup_run" ->
      """SELECT true AS pair_budget_ok, true AS kept_nonempty""".stripMargin,
    "e3_semdedup" ->
      """SELECT true AS recall_ok, true AS precision_ok,
        |  true AS pair_budget_ok, true AS representatives_kept_ok""".stripMargin,
    "e3_label_coherence" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (
        |  SELECT label AS clabel, list(m ORDER BY pos) AS cv FROM (
        |    SELECT label, pos, round(avg(x), 8) AS m FROM (
        |      SELECT label, unnest(v) AS x,
        |        generate_subscripts(v, 1) AS pos FROM e)
        |    GROUP BY label, pos)
        |  GROUP BY label),
        |a AS (
        |  SELECT e.vec_id, e.label, c.clabel,
        |    round(list_dot_product(e.v, c.cv), 6) AS d
        |  FROM e CROSS JOIN c),
        |r AS (
        |  SELECT vec_id, label, clabel,
        |    row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY d DESC, clabel) AS rn
        |  FROM a)
        |SELECT label, count(*)::BIGINT AS n,
        |  sum(CASE WHEN clabel = label THEN 1 ELSE 0 END)::BIGINT
        |    AS n_correct,
        |  round(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 4) AS acc
        |FROM r WHERE rn = 1 GROUP BY label ORDER BY label""".stripMargin,
    "e3_pca" ->
      """SELECT true AS var1_matches_l1, true AS var2_matches_l2,
        |  true AS uncorrelated, true AS centered,
        |  true AS spectrum_ordered, true AS nonempty""".stripMargin,
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
    "e3_knn_classify" ->
      """WITH n AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label AS n_label,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM n q, n c WHERE q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
        |r AS (
        |  SELECT q_id, n_label,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id)
        |      AS rnk
        |  FROM p),
        |votes AS (
        |  SELECT q_id, n_label, count(*) AS votes
        |  FROM r WHERE rnk <= 5 GROUP BY q_id, n_label),
        |pred AS (
        |  SELECT q_id, n_label AS pred_label,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY votes DESC, n_label) AS pr
        |  FROM votes)
        |SELECT e.vec_id AS q_id, e.label AS true_label, p.pred_label,
        |  e.label = p.pred_label AS correct
        |FROM n e JOIN pred p ON p.q_id = e.vec_id AND p.pr = 1
        |ORDER BY q_id""".stripMargin,
    "e3_ann_recall" ->
      "SELECT true AS recall_ok, true AS cand_budget_ok",
    "e3_mips_ann" ->
      "SELECT true AS recall_ok, true AS cand_budget_ok",
    // Direct inner-product ranking — the reduction's augmented-dot
    // rank must reproduce it exactly (the tail term is an exact 0).
    "e3_mips_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |c AS (
        |  SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv
        |  FROM embeddings),
        |p AS (
        |  SELECT q_id, c_id, list_dot_product(qv, cv) AS ip
        |  FROM q, c WHERE c_id <> q_id),
        |r AS (
        |  SELECT q_id, c_id, ip,
        |    row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, c_id)
        |      AS rnk
        |  FROM p)
        |SELECT q_id, rnk, c_id, round(ip, 6) AS ip FROM r
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "e3_ann_neardup" ->
      "SELECT true AS recall_ok, true AS precision_ok, true AS pair_budget_ok",
    "e3_ivf_recall" ->
      "SELECT true AS recall_ok, true AS scan_budget_ok",
    "e3_ivf_indexed" ->
      "SELECT true AS index_equals_memory, true AS nonempty",
    "e3_ivf_incremental" ->
      """SELECT true AS ingest_equals_memory, true AS recall_ok,
        |  true AS scan_budget_ok""".stripMargin,
    "e3_ivf_rebalance" ->
      """SELECT true AS untouched_intact, true AS table_ok,
        |  true AS no_loss_no_dup, true AS split_shrunk,
        |  true AS recall_ok, true AS scan_budget_ok""".stripMargin,
    "e3_ivf_delete" ->
      """SELECT true AS mor_equals_fresh, true AS deleted_never_surface,
        |  true AS compact_preserves_search, true AS compact_rows_ok,
        |  true AS untouched_cells_preserved,
        |  true AS sidecar_folded""".stripMargin,
    "e3_ivfpq_delete" ->
      """SELECT true AS mor_equals_fresh, true AS deleted_never_surface,
        |  true AS compact_preserves_search, true AS codes_compact_ok,
        |  true AS sidecar_folded""".stripMargin,
    "e3_ivfpq_incremental" ->
      """SELECT true AS codes_frozen_ok, true AS ingest_equals_memory,
        |  true AS recall_ok, true AS scan_budget_ok""".stripMargin,
    "e3_quantized_cosine" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (
        |  SELECT vec_id, v,
        |    greatest(list_max(list_transform(v, x -> abs(x))), 1e-30)
        |      / 127.0 AS sc
        |  FROM v),
        |r AS (
        |  SELECT vec_id, v,
        |    list_transform(v, x -> round(x / sc) * sc) AS r
        |  FROM sc),
        |nn AS (
        |  SELECT vec_id, v, r,
        |    sqrt(list_dot_product(v, v)) AS n,
        |    sqrt(list_dot_product(r, r)) AS rn
        |  FROM r),
        |p AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_dot_product(q.r, c.r) / (q.rn * c.rn) AS qsim,
        |    list_dot_product(q.v, c.v) / (q.n * c.n) AS esim
        |  FROM nn q, nn c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
        |rk AS (
        |  SELECT q_id, c_id, qsim, esim,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY qsim DESC, c_id) AS rnk
        |  FROM p)
        |SELECT q_id, rnk, c_id, round(qsim, 6) AS qsim,
        |  round(abs(qsim - esim), 4) AS err
        |FROM rk WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,
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
