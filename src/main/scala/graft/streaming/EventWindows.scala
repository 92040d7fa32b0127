package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-time windowing over the events table (SURVEY §2.10): the
  * reference is batch-only, so tumbling and session windows are
  * expressed in batch with the same `window`/`session_window` operators
  * Structured Streaming uses — the plans are identical modulo the
  * incremental state store, which is exactly how the code ports to a
  * `readStream` source unchanged (see graft.streaming.StreamDemo).
  */
object EventWindows {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-day windows × event type — counts and value sums. */
  private val ev1Tumbling: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy(col("ws"), col("event_type"))

  /** Session windows per user with a 6-hour inactivity gap — session
    * start/size. Session start is emitted as epoch micros so the
    * ns-precision oracle and the µs-precision engine agree exactly. */
  private val ev2Session: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Sliding 2-day windows advancing daily — every event lands in
    * exactly two windows. */
  private val ev3Sliding: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("ws"), col("n"), col("sum_value"))
      .orderBy(col("ws"))

  /** Gap-filled per-user daily resample — the time-series op Spark has
    * no built-in for (Flink/ksql interpolation, Pandas `resample`):
    * every (user, day) cell of the first week of Jan 2024 exists in the
    * output, zero-filled where no events landed. The dense grid comes
    * from a map-side `explode(sequence(...))` over the DISTINCT-user
    * frame (|users| × days rows, never |events| × days); actual daily
    * aggregates join onto it keyed by (user, day). Low-cardinality
    * users here; at 100 TB the grid frame stays dim-sized while the
    * fact aggregates first. */
  private val ev4Resample: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val days = ev.select(col("user_id")).distinct()
      .select(col("user_id"), explode(sequence(
        to_timestamp(lit("2024-01-01")), to_timestamp(lit("2024-01-07")),
        expr("INTERVAL 1 DAY"))).as("day"))
    val actual = ev
      .filter(col("ts") >= to_timestamp(lit("2024-01-01")) &&
        col("ts") < to_timestamp(lit("2024-01-08")))
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
    days.join(actual, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Ordered funnel (view → click → purchase): a user advances a stage
    * only with an event strictly AFTER their previous stage's first
    * event — the product-analytics primitive. Three conditional min-ts
    * aggregations keyed by user (each a partial-agg shuffle of (user,
    * ts) pairs — events never re-sort globally), stitched with
    * user-keyed joins; per-stage membership pinned by id checksum. */
  private val ev5Funnel: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    def first(tpe: String) = ev.filter(col("event_type") === tpe)
      .groupBy(col("user_id")).agg(min(col("ts")).as(s"t_$tpe"))
    val s1 = first("view")
    val s2 = s1.join(ev.filter(col("event_type") === "click"), Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(col("ts")).as("t_click"))
    val s3 = s2.join(ev.filter(col("event_type") === "purchase"), Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    def stageRow(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_users"), sum(col("user_id")).as("sum_users"))
        .select(lit(name).as("stage"), col("n_users"), col("sum_users"))
    stageRow("1_view", s1)
      .unionByName(stageRow("2_click", s2))
      .unionByName(stageRow("3_purchase", s3))
      .orderBy(col("stage"))
  }

  /** Cohort retention: cohort = day of a user's first event, cell
    * (cohort, offset) = users active `offset` days after joining. Two
    * keyed aggregations (first day per user, distinct active days) and
    * one user-keyed join — the standard retention matrix, linear. */
  private val ev6Retention: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val cohort = ev.groupBy(col("user_id"))
      .agg(date_trunc("DAY", min(col("ts"))).as("cohort_day"))
    val active = ev.select(col("user_id"),
      date_trunc("DAY", col("ts")).as("day")).distinct()
    cohort.join(active, Seq("user_id"))
      .withColumn("offset_days", datediff(col("day"), col("cohort_day")))
      .filter(col("offset_days").between(0, 7))
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  /** Markov transition matrix over each user's event sequence: lag
    * window keyed by user (ties broken by event_id in BOTH engines —
    * determinism convention), then (prev → next) counts and row-
    * normalized probabilities. One user-partitioned window + one keyed
    * agg; the per-user window is bounded by that user's events. */
  private val ev7Markov: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("next"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("next")).agg(count(lit(1)).as("n"))
    pairs.withColumn("p",
      round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev"))), 6))
      .orderBy(col("prev"), col("next"))
  }

  /** Daily-volume anomaly flags: a (type, day) cell is anomalous when
    * its count exceeds that type's mean + 2σ over the month. Two-level
    * aggregation (events → daily counts → per-type moments via a
    * type-partitioned window over the ~30-row daily frame). */
  private val ev8Anomaly: Q = (s, dir) => {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type"))
    daily
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sigma", stddev_pop(col("n")).over(w))
      .filter(col("n") > col("mu") + lit(2.0) * col("sigma"))
      .select(col("event_type"), col("day"), col("n"),
        round(col("mu"), 4).as("mu"), round(col("sigma"), 4).as("sigma"))
      .orderBy(col("event_type"), col("day"))
  }

  /** First/last-touch attribution: each purchase is attributed to the
    * first and the most recent PRECEDING touch event (view/click/
    * signup) of the same user; purchases and revenue roll up per
    * (first, last) channel pair. One user-partitioned window pass
    * (rows-frame first/last with ignoreNulls — no self-join per
    * purchase) + one keyed agg; the window sort is bounded per user,
    * events never sort globally. */
  private val ev9Attribution: Q = (s, dir) => {
    val touch = when(col("event_type").isin("view", "click", "signup"),
      col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("value"),
        first(touch, ignoreNulls = true).over(w).as("first_touch"),
        last(touch, ignoreNulls = true).over(w).as("last_touch"))
      .filter(col("event_type") === "purchase" && col("last_touch").isNotNull)
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 4).as("revenue"))
      .orderBy(col("first_touch"), col("last_touch"))
  }

  /** Inter-arrival burstiness per user — the Goh–Barabási B =
    * (σ−μ)/(σ+μ) coefficient over event gaps (B→1 bursty, B→−1
    * metronome, B≈0 Poisson); the signal behind bot/scraper detection
    * in event pipelines. One user-partitioned window pass (lag) + one
    * keyed agg; gap arithmetic is exact integer micros divided by 10⁶,
    * and B recomputes from the ROUNDED μ/σ columns on both engines per
    * the rounding-parity convention. */
  private val ev10Burstiness: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = t(s, dir, "events")
      .select(col("user_id"),
        ((unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")))
          .cast("double") / 1000000.0).as("gap_s"))
      .filter(col("gap_s").isNotNull)
    val stats = gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap_s")), 4).as("mean_gap_s"),
        round(stddev_samp(col("gap_s")), 4).as("sd_gap_s"))
      .filter(col("n_gaps") >= 2)
    stats.select(col("user_id"), col("n_gaps"), col("mean_gap_s"),
      col("sd_gap_s"),
      round((col("sd_gap_s") - col("mean_gap_s")) /
        (col("sd_gap_s") + col("mean_gap_s")), 4).as("burstiness"))
      .orderBy(col("user_id"))
  }

  /** Collect-free replay staging (round-8 verdict item 4): partition
    * `df` into ONE parquet file per ascending value of its long batch
    * column `b` (dropped from the staged schema — it is harness
    * routing, not data) and return the staged files in replay order
    * plus an empty landing directory for the stream to tail. The
    * replay driver then MOVES one file per micro-batch into the
    * landing dir and drains the query — the landing-zone pattern
    * ev11/ev19/ev20 already use, so the event rows themselves never
    * reach the driver: the only driver-side values are the file
    * manifest and 1-row max() aggregates. Each batch lands in exactly
    * one file because `repartition(col("b"))` routes a whole batch to
    * one task and `partitionBy("b")` makes that task write one file
    * per batch directory. */
  private def stageReplay(s: SparkSession, df: DataFrame)
      : (Seq[java.nio.file.Path], String) = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("replay_").toString
    val staged = s"$root/staged"
    val tS0 = System.nanoTime()
    df.repartition(col("b")).write.partitionBy("b").parquet(staged)
    System.err.println(f"[evdiag] stage write ${(System.nanoTime()-tS0)/1e9}%.2f")
    val ls = Files.list(Paths.get(staged))
    val bdirs =
      try ls.iterator().asScala
        .filter(_.getFileName.toString.startsWith("b="))
        .map(p => (p.getFileName.toString.stripPrefix("b=").toLong, p))
        .toSeq.sortBy(_._1)
      finally ls.close()
    val files = bdirs.map { case (b, bdir) =>
      val bs = Files.list(bdir)
      val fs =
        try bs.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        finally bs.close()
      require(fs.size == 1, s"batch $b staged as ${fs.size} files")
      fs.head
    }
    val landing = s"$root/landing"
    Files.createDirectory(Paths.get(landing))
    (files, landing)
  }

  /** Drive a started stream through the staged batches: move one file
    * into the landing dir, drain, repeat — one micro-batch per file. */
  private def replay(files: Seq[java.nio.file.Path], landing: String,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    for ((f, i) <- files.zipWithIndex) {
      java.nio.file.Files.move(f,
        java.nio.file.Paths.get(landing, f"b$i%05d.parquet"))
      q.processAllAvailable()
    }

  /** EV11: incremental dedup EXECUTED AS A STREAM, oracle-gated — the
    * round-6 verdict's missing streaming proof. The documents table is
    * staged into a landing directory, tailed with `readStream`, pushed
    * through [[StreamDemo.incrementalDedupStream]] (watermarked
    * `dropDuplicatesWithinWatermark` on the sha2 digest + stream-static
    * left-anti join against the corpus digest set), driven to
    * completion into a memory sink, and the SURVIVING DIGEST SET is
    * compared against the batch answer DuckDB computes from the same
    * inputs. The set is arrival-order-independent (which physical row
    * survives per digest is not — so the query projects the digest,
    * which is total); corpus = every doc_id ≡ 0 (mod 5). Event time is
    * synthesized deterministically from doc_id. */
  private val ev11StreamDedup: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val landing = graft.lake.Lake.scratchDir("ev11_landing")
    docs.withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
      .write.mode("overwrite").parquet(landing)
    val corpus = docs.filter(col("doc_id") % 5 === 0)
      .select(sha2(col("text"), 256).as("digest")).distinct()
    val schema = s.read.parquet(landing).schema
    val sink = "ev11_out_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val q = StreamDemo.incrementalDedupStream(
        s.readStream.schema(schema).parquet(landing), corpus)
      .select(col("digest"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink).select(col("digest")).distinct()
      .orderBy(col("digest"))
  }

  /** EV26: declarative streaming dedup with CROSS-BATCH state, oracle-
    * gated — the built-in/hand-rolled pairing ev23 gave sessionization,
    * closed for dedup. ev11 also runs `dropDuplicatesWithinWatermark`,
    * but it stages every file up front and drains in ONE micro-batch,
    * so the dedup state never survives a batch boundary. Here the
    * corpus replays through [[stageReplay]] one file per micro-batch
    * (5 base batches in event-time order), and every doc_id ≡ 0 (mod 3)
    * document ARRIVES AGAIN one batch later (same text ⇒ same digest,
    * +50 ms event time): suppressing the replayed copy requires the
    * digest state written by batch k to be consulted in batch k+1 — the
    * cross-batch path a single-batch run never exercises. Event time is
    * compressed (100 ms per doc_id, ~8 min span at sf0.1) so the 1-hour
    * watermark never evicts state mid-replay and the surviving set is
    * EXACTLY the distinct digest set, which the oracle restates; the
    * `require` pins that replayed copies actually crossed a batch
    * boundary (structural, not hash-visible). */
  private val ev26StreamDropdup: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val nBatches = 5L
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) // 1 row
    val step = maxId / nBatches + 1L
    val base = docs.select(col("text"),
      timestamp_millis(col("doc_id") * 100L).as("ts"),
      (col("doc_id") / step).cast("long").as("b"))
    val dups = docs.filter(col("doc_id") % 3 === 0).select(col("text"),
      timestamp_millis(col("doc_id") * 100L + 50L).as("ts"),
      ((col("doc_id") / step).cast("long") + 1L).as("b"))
    val (files, landing) = stageReplay(s, base.unionByName(dups))
    require(files.size.toLong == nBatches + 1L,
      s"replays must spill into a 6th batch, staged ${files.size}")
    val schema = s.read.parquet(files.head.toString).schema
    val sink = "ev26_out_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try s.readStream.schema(schema).parquet(landing)
          .withColumn("digest", sha2(col("text"), 256))
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("digest")
          .select(col("digest"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try replay(files, landing, q) finally q.stop()
    s.table(sink).select(col("digest")).orderBy(col("digest"))
  }

  /** EV30 ✱: streaming cardinality via the DataSketches HLL built-in
    * (Spark 4 `hll_sketch_agg`) — the fixed-state mergeable way to
    * track distinct users per event type in a stream at 100 TB: exact
    * streaming COUNT(DISTINCT) holds every key in state, the sketch
    * holds 2^lgK registers regardless of cardinality. Complete-mode
    * aggregation accumulates sketch state ACROSS micro-batches — the
    * events replay one day-bucket per batch and users recur across
    * days, so the final estimate is only right if batch k's registers
    * survive into batch k+1 (all_events_seen pins that every batch
    * was delivered into the same state). Gate: per type, the exact
    * distinct count value-gated vs DuckDB, plus the estimate's
    * relative error asserted in-plan ≤ 4% (lgK=12 ⇒ RSE ≈ 0.8%,
    * bounded at ~5σ). */
  private val ev30StreamHll: Q = (s, dir) => {
    val ev = t(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        (dayofmonth(col("ts")) % 5).cast("long").as("b"))
    val (files, landing) = stageReplay(s, ev)
    require(files.size == 5, s"expected 5 day buckets, got ${files.size}")
    val schema = s.read.parquet(files.head.toString).schema
    val sink = "ev30_out_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try s.readStream.schema(schema).parquet(landing)
          .groupBy(col("event_type"))
          .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
            count(lit(1)).as("n_events"))
          .select(col("event_type"),
            expr("hll_sketch_estimate(sk)").as("est"), col("n_events"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try replay(files, landing, q) finally q.stop()
    val exact = t(s, dir, "events").groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        count(lit(1)).as("n_events_batch"))
    s.table(sink)
      .join(exact, "event_type")
      .select(col("event_type"), col("n_exact"),
        (col("n_events") === col("n_events_batch")).as("all_events_seen"),
        (abs(col("est") - col("n_exact")) <=
          col("n_exact") * 0.04 + lit(1.0)).as("estimate_ok"))
      .orderBy(col("event_type"))
  }

  /** EV29: streaming dedup on a DERIVED canonical key — the crawler
    * frontier shape: URLs arrive as case/tracking/port variants across
    * micro-batches, are canonicalized MAP-SIDE inside the stream
    * ([[graft.ext.Hygiene.urlCanon]]), and
    * `dropDuplicatesWithinWatermark` keys its state on the canonical
    * form — so variants of one logical URL that arrive in DIFFERENT
    * batches still collapse to one row (raw-string dedup would pass
    * both). Same bucket-replay harness as ev26 (collect-free landing
    * dir, one micro-batch per staged file); every 3rd doc's URL is
    * re-fed in the NEXT batch under the opposite case variant, so the
    * cross-batch merge is actually exercised. Oracle = the batch
    * distinct over the canonicalized plant. */
  private val ev29StreamUrlDedup: Q = (s, dir) => {
    import graft.ext.Hygiene
    val docs = t(s, dir, "documents")
    val nBatches = 5L
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) // 1 row
    val step = maxId / nBatches + 1L
    val planted = Hygiene.withPlantedUrls(docs)
    val base = planted.select(col("url"),
      timestamp_millis(col("doc_id") * 100L).as("ts"),
      (col("doc_id") / step).cast("long").as("b"))
    // A VARIANT of every 3rd URL lands one batch LATER: the +455
    // offset preserves every content modulus (455 = 7·13·5, so host
    // number, path segment, and id param are unchanged → SAME
    // canonical form) while flipping the %2 case bit and changing the
    // stripped utm/fragment parts — a raw-string dedup passes it, the
    // canonical dedup must not.
    val revisits = Hygiene.withPlantedUrls(
        docs.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 455L).as("doc_id"), col("lang"),
            col("text")))
      .select(col("url"),
        timestamp_millis((col("doc_id") - 455L) * 100L + 50L).as("ts"),
        (((col("doc_id") - 455L) / step).cast("long") + 1L).as("b"))
    val (files, landing) = stageReplay(s, base.unionByName(revisits))
    require(files.size.toLong == nBatches + 1L,
      s"revisits must spill into a 6th batch, staged ${files.size}")
    val schema = s.read.parquet(files.head.toString).schema
    val sink = "ev29_out_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try s.readStream.schema(schema).parquet(landing)
          .withColumn("canon", Hygiene.urlCanon(col("url")))
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("canon")
          .select(col("canon"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try replay(files, landing, q) finally q.stop()
    s.table(sink).select(col("canon")).orderBy(col("canon"))
  }

  /** EV12: gap sessionization EXECUTED AS A STREAM with custom state
    * (flatMapGroupsWithState), oracle-gated against the batch
    * gaps-and-islands answer. The events table is replayed through a
    * MemoryStream in 1-day event-time buckets (widened at bench time
    * by the replay-coarsening knob — sessionize is slicing-invariant,
    * so any bucket width yields the same output; a spec pins it),
    * one micro-batch per bucket so watermark advancement
    * and state timeouts exercise the real incremental path; a
    * keep-alive row (user −1, bucket end) pins the watermark per
    * bucket even when the data goes quiet, and a final far-future
    * keep-alive closes every trailing session. The replay is
    * COLLECT-FREE: buckets are staged as one parquet file each and
    * moved into a landing dir the stream tails (the ev11/ev19/ev20
    * pattern — exactly how a cluster consumes a bucketed landing
    * zone); the operator under test holds three longs per key.
    * Session arithmetic is in epoch MILLIS on both engines. */
  private val ev12StreamSessions: Q = (s, dir) =>
    sessionGate(s, dir, StreamDemo.sessionize(_, 86400000L))

  /** Shared session-gate harness for ev12/ev21/ev22: stage the events
    * into 1-day-bucket files, tail them as a stream through `mk` (the
    * sessionizer under test), and return the closed-session table in
    * oracle shape. */
  private def sessionGate(s: SparkSession, dir: String,
      mk: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)] =>
        org.apache.spark.sql.Dataset[StreamDemo.SessionOut]): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    import s.implicits._
    val gapMs = 86400000L // 1 day
    // Bench-time replay coarsening (round-12 verdict item 7): the four
    // session gates' bench cost is ~30 sequential micro-batch cycles
    // of pure replay latency (exec ≤ 0.4 s) that scales with VM
    // weather, not engine throughput. graft.Bench sets
    // `graft.replay.coarsen` (Verify never does, so the CORRECTNESS
    // gate still drives the full per-day replay): buckets widen by the
    // factor — same rows, same event-time order, per-bucket keep-
    // alives still pin each bucket's watermark, final flush unchanged
    // — so the append-mode session output is identical and only the
    // number of watermark advances drops.
    val coarsen = math.max(1,
      sys.props.getOrElse("graft.replay.coarsen", "1").toInt)
    val bucketMs = gapMs * coarsen
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .withColumn("b", expr(s"unix_millis(ts) div $bucketMs"))
    val lastMs = ev.agg(max(unix_millis(col("ts")))).head.getLong(0) // 1 row
    val keepAlive = ev.select(col("b")).distinct()
      .select(col("b"), lit(-1L).as("user_id"),
        timestamp_millis((col("b") + 1) * bucketMs - 1).as("ts"))
    val finalKa = s.range(1).select(
      lit(lastMs / bucketMs + 1).as("b"), lit(-1L).as("user_id"),
      timestamp_millis(lit(lastMs + 3 * gapMs)).as("ts"))
    val (files, landing) = stageReplay(s,
      ev.select(col("b"), col("user_id"), col("ts"))
        .unionByName(keepAlive).unionByName(finalKa))
    val schema = s.read.parquet(files.head.toString).schema
    val sink = "ev12_out_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    // A streaming query pins its STATE STORE partition count from
    // shuffle.partitions at first start; at 30 sequential micro-batches
    // the replay's wall clock is task-launch bound (batches × state
    // partitions), so scope the count down for this query only and
    // restore it (try/finally; Verify/Bench run queries sequentially).
    // A real deployment sizes it to key cardinality instead.
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try mk(s.readStream.schema(schema).parquet(landing)
          .as[(Long, java.sql.Timestamp)])
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try replay(files, landing, q) finally q.stop()
    s.table(sink).filter(col("userId") >= 0)
      .select(col("userId").as("user_id"),
        col("nEvents").cast("long").as("n_events"),
        col("startMs").as("start_ms"), col("endMs").as("end_ms"))
      .orderBy(col("user_id"), col("start_ms"))
  }

  /** EV13: stream-stream interval join EXECUTED AS TWO STREAMS,
    * oracle-gated against the batch join. Impressions (views) and
    * clicks are carved from the events table (`ad = user_id % 50`),
    * replayed through two parquet landing dirs in synchronized 5-day
    * event-time buckets (one micro-batch per bucket, a keep-alive row
    * per stream pinning each bucket's watermark), and joined with
    * [[StreamDemo.intervalJoin]] — watermarked on BOTH sides with the
    * time bound in the join condition, which is what lets the engine
    * expire buffered state instead of holding both streams forever.
    * EXACTNESS: with bucketed in-event-time-order replay, an
    * impression at time T is evicted only once the watermark passes
    * T+1h, i.e. once max-seen event time passes T+3h — but every
    * click matching T lies in [T, T+1h], which under ≥1h-wide ordered
    * buckets has already arrived by then. So the streamed inner join
    * emits exactly the batch answer, which DuckDB recomputes as a
    * plain interval join. Timestamps compare as epoch micros. */
  /** Shared two-stream bucket-replay harness for the interval-join
    * gates: impressions (`view`) and clicks (`click`) replay through
    * two parquet landing dirs in 5-day event-time buckets (one staged
    * file per bucket per side, moved in lockstep — COLLECT-FREE, the
    * ev11/ev19/ev20 landing-zone pattern), with per-bucket keep-alives
    * advancing BOTH watermarks (the global watermark is the min across
    * sources; ads −1/−2 match nothing). `finalFlushMs`, when set,
    * appends one last keep-alive pair that far (in ms) past the final
    * bucket — an OUTER join only emits its unmatched rows when the
    * watermark expires their state, so the tail needs an explicit
    * push; an inner join emits on match and needs none. Returns the
    * memory-sink table of the joined stream. */
  private def replayIntervalJoin(s: SparkSession, dir: String,
      join: (DataFrame, DataFrame) => DataFrame,
      finalFlushMs: Option[Long]): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    // Bench-time replay coarsening (round-13 verdict item 6 — the
    // ev12 treatment, applied to the two-sided lockstep replay): the
    // three join gates' bench cost is ~30 sequential micro-batch
    // cycles each of pure replay latency. Wider buckets keep the
    // exactness argument verbatim (it holds for ANY ordered width ≥
    // the 1h join bound), keep-alives still pin each bucket's
    // watermark on BOTH sides, and the outer tails still flush on the
    // same final keep-alive pair — so the emitted set is identical
    // and only the number of lockstep advances drops. Verify never
    // sets the knob, so the CORRECTNESS gate drives the full replay;
    // a StreamingSpec test pins slicing-invariance for all three
    // join shapes.
    val coarsen = math.max(1,
      sys.props.getOrElse("graft.replay.coarsen", "1").toInt)
    val bucketMs = coarsen * 5L * 86400000L // ≥ 5 days ≥ the 1h bound
    val ev = t(s, dir, "events")
      .select((col("user_id") % 50).as("ad"), col("event_type"),
        col("ts").cast("timestamp").as("ts"))
      .filter(col("event_type").isin("view", "click"))
      .withColumn("b", expr(s"unix_millis(ts) div $bucketMs"))
    val allB = ev.select(col("b")).distinct()
    val tM0 = System.nanoTime()
    val maxB = allB.agg(max(col("b"))).head.getLong(0) // 1 row
    System.err.println(f"[evdiag] maxB agg ${(System.nanoTime()-tM0)/1e9}%.2f")
    def side(tpe: String, kaAd: Long): DataFrame = {
      val ka = allB.select(col("b"), lit(kaAd).as("ad"),
        timestamp_millis((col("b") + 1) * bucketMs - 1).as("ts"))
      val flush = finalFlushMs.toSeq.map { f =>
        s.range(1).select(lit(maxB + 1).as("b"), lit(kaAd).as("ad"),
          timestamp_millis(lit((maxB + 1) * bucketMs - 1 + f)).as("ts"))
      }
      flush.foldLeft(
        ev.filter(col("event_type") === tpe)
          .select(col("b"), col("ad"), col("ts"))
          .unionByName(ka))(_ unionByName _)
    }
    val (impFiles, impLanding) = stageReplay(s, side("view", -1L))
    val (clkFiles, clkLanding) = stageReplay(s, side("click", -2L))
    // Per-bucket keep-alives on BOTH sides make the two staged
    // sequences bucket-aligned by construction.
    require(impFiles.size == clkFiles.size,
      s"replay misaligned: ${impFiles.size} vs ${clkFiles.size} buckets")
    val schema = s.read.parquet(impFiles.head.toString).schema
    val sink = "evjoin_out_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    // Unlike the session gates (task-launch bound → 4 partitions), the
    // join replay is COMPUTE-bound: each micro-batch probes every
    // buffered row of the matching ad, so per-batch work ~ |views|·
    // |clicks|/|ads| and 4 state partitions serialize it onto 4 cores.
    // 16 partitions parallelize the probe scans; state partitioning
    // never affects the emitted set (r15, guide §2.6).
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val tQ0 = System.nanoTime()
    val q =
      try join(
          s.readStream.schema(schema).parquet(impLanding)
            .toDF("impAd", "impTs"),
          s.readStream.schema(schema).parquet(clkLanding)
            .toDF("clickAd", "clickTs"))
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    System.err.println(f"[evdiag] start ${(System.nanoTime()-tQ0)/1e9}%.2f")
    try {
      for (((fi, fc), i) <- impFiles.zip(clkFiles).zipWithIndex) {
        val tB0 = System.nanoTime()
        java.nio.file.Files.move(fi,
          java.nio.file.Paths.get(impLanding, f"b$i%05d.parquet"))
        java.nio.file.Files.move(fc,
          java.nio.file.Paths.get(clkLanding, f"b$i%05d.parquet"))
        q.processAllAvailable()
        System.err.println(f"[evdiag] batch $i ${(System.nanoTime()-tB0)/1e9}%.2f")
      }
    } finally {
      q.recentProgress.foreach { p =>
        System.err.println(s"[evdiag] bprog ${p.batchId} dur=${p.durationMs} rows=${p.numInputRows}")
      }
      val tX0 = System.nanoTime()
      q.stop()
      System.err.println(f"[evdiag] stop ${(System.nanoTime()-tX0)/1e9}%.2f")
    }
    s.table(sink)
  }

  private val ev13StreamJoin: Q = (s, dir) =>
    replayIntervalJoin(s, dir, StreamDemo.intervalJoin, finalFlushMs = None)
      .select(col("ad"), unix_micros(col("impTs")).as("imp_us"),
        unix_micros(col("clickTs")).as("click_us"))
      .orderBy(col("ad"), col("imp_us"), col("click_us"))

  /** EV17: stream-stream LEFT OUTER interval join — the semantics the
    * inner gate can't exercise: an unmatched impression is emitted
    * (click NULL) only when the watermark passes its join-window end
    * and its state drops — null emission IS state expiry, the
    * bounded-state contract made visible in the result set. A final
    * 30-day keep-alive pushes the watermark past every impression so
    * the tail flushes; keep-alive ads (< 0) are themselves unmatched
    * left rows and are filtered. The emitted set must equal DuckDB's
    * batch LEFT JOIN (null ordering pinned NULLS FIRST to match
    * Spark's ascending default). */
  private val ev17StreamLeftJoin: Q = (s, dir) =>
    replayIntervalJoin(s, dir, StreamDemo.intervalJoinLeftOuter,
      finalFlushMs = Some(30L * 86400000L))
      .filter(col("ad") >= 0)
      .select(col("ad"), unix_micros(col("impTs")).as("imp_us"),
        unix_micros(col("clickTs")).as("click_us"))
      .orderBy(col("ad"), col("imp_us"), col("click_us"))

  /** EV25: stream-stream FULL OUTER interval join — completes the
    * outer-join matrix (ev13 inner, ev17 left): BOTH unmatched sides
    * must surface, each only when the watermark expires its state — an
    * unclicked impression emits null-click, an impression-less click
    * (organic traffic) emits null-impression. Same replay harness and
    * exactness argument as ev17, applied symmetrically; keep-alive
    * rows (ads −1/−2) surface as unmatched rows on their own side and
    * are filtered on the coalesced ad. Oracle = DuckDB's batch FULL
    * JOIN with both null orderings pinned NULLS FIRST. */
  private val ev25StreamFullJoin: Q = (s, dir) =>
    replayIntervalJoin(s, dir, StreamDemo.intervalJoinFullOuter,
      finalFlushMs = Some(30L * 86400000L))
      .filter(col("ad") >= 0)
      .select(col("ad"), unix_micros(col("impTs")).as("imp_us"),
        unix_micros(col("clickTs")).as("click_us"))
      .orderBy(col("ad"), col("imp_us"), col("click_us"))

  /** EV14: watermarked tumbling-window aggregation EXECUTED AS A
    * STREAM in APPEND mode, oracle-gated — the mode where the state
    * story is real: a 1-day window only EMITS once the watermark (1 h
    * behind max event time) passes its end, at which point its state
    * is dropped — the bounded-state contract for an unbounded stream.
    * Events replay through a parquet landing dir in 5-day buckets (in
    * event-time order, one micro-batch per bucket — replay bucket
    * width is a harness knob independent of the 1-day window width;
    * coarser buckets just finalize windows in groups) and a final
    * far-future keep-alive (type `_ka`) pushes the watermark past
    * every real window so all of them finalize; the keep-alive's own
    * window never finalizes and is filtered. The emitted window set
    * must equal the batch tumbling aggregation DuckDB computes. */
  private val ev14StreamWindows: Q = (s, dir) => {
    import org.apache.spark.sql.streaming.OutputMode
    val dayMs = 86400000L
    // Bench-time replay coarsening (the scaladoc's "harness knob":
    // coarser buckets just finalize windows in groups — the emitted
    // set is identical; StreamingSpec pins it). Verify never sets the
    // knob, so the correctness gate drives the 5-day replay.
    val bucketMs = math.max(1,
      sys.props.getOrElse("graft.replay.coarsen", "1").toInt) * 5 * dayMs
    val ev = t(s, dir, "events")
      .select(col("ts").cast("timestamp").as("ts"),
        col("event_type").as("eventType"), col("value"))
      .withColumn("b", expr(s"unix_millis(ts) div $bucketMs"))
    val lastMs = ev.agg(max(unix_millis(col("ts")))).head.getLong(0) // 1 row
    val finalKa = s.range(1).select(
      lit(lastMs / bucketMs + 1).as("b"),
      timestamp_millis(lit(lastMs + 3 * dayMs)).as("ts"),
      lit("_ka").as("eventType"), lit(0.0).as("value"))
    val (files, landing) = stageReplay(s,
      ev.select(col("b"), col("ts"), col("eventType"), col("value"))
        .unionByName(finalKa))
    val schema = s.read.parquet(files.head.toString).schema
    val sink = "ev14_out_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try StreamDemo.windowedCounts(
          s.readStream.schema(schema).parquet(landing))
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try replay(files, landing, q) finally q.stop()
    s.table(sink).filter(col("eventType") =!= "_ka")
      .select(col("ws"), col("eventType").as("event_type"), col("n"),
        col("sum_value"))
      .orderBy(col("ws"), col("event_type"))
  }

  /** EV15: stream-static SEMANTIC dedup EXECUTED AS A STREAM with a
    * full value-level oracle — fresh embeddings (vec_id ≢ 0 mod 5)
    * arrive in three micro-batches (vec_id mod 3 — the anti-join is
    * STATELESS, so the survivor set is batching-independent) from a
    * parquet landing dir and anti-join the static corpus (vec_id ≡ 0
    * mod 5) on the cosine bound via
    * [[StreamDemo.semanticDedupStream]]. The join is stateless, so the
    * streamed survivor set EQUALS the batch anti-join, which DuckDB
    * recomputes exactly (raw-dot threshold comparison — the
    * e3_cosine_neardup float-parity convention). */
  private val ev15StreamSemdedup: Q = (s, dir) => {
    import org.apache.spark.sql.streaming.OutputMode
    def prep(df: DataFrame, vc: String, nc: String): DataFrame = {
      val v = transform(col("embedding"), _.cast("double"))
      df.withColumn(vc, v)
        .withColumn(nc,
          sqrt(graft.functions.VecDot.vecDot(col(vc), col(vc))))
    }
    val emb = t(s, dir, "embeddings")
    val corpus = prep(emb.filter(col("vec_id") % 5 === 0), "cv", "cnrm")
      .select(col("cv"), col("cnrm"))
    val (files, landing) = stageReplay(s,
      emb.filter(col("vec_id") % 5 =!= 0)
        .select((col("vec_id") % 3).as("b"), col("vec_id"),
          col("embedding")))
    val schema = s.read.parquet(files.head.toString).schema
    val sink = "ev15_out_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try StreamDemo.semanticDedupStream(
          prep(s.readStream.schema(schema).parquet(landing), "v", "nrm"),
          corpus, tau = 0.45)
        .select(col("vec_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try replay(files, landing, q) finally q.stop()
    s.table(sink).select(col("vec_id")).orderBy(col("vec_id"))
  }

  /** EV18: update-mode streaming aggregation UPSERTED into a keyed
    * lake state table — the streaming-MERGE surface (ev16 covers
    * append routing; this is the mutable-aggregate counterpart every
    * metrics pipeline runs). Events replay in 5-day buckets through a
    * (event_type, day) count/sum aggregation in UPDATE mode; each
    * micro-batch's changed-key rows MERGE into a hash-bucketed parquet
    * state table via [[StreamDemo.upsertState]] (bucket-scoped rewrite,
    * never a full-state rewrite). The gate reads the final state table
    * back: because update mode emits the complete new aggregate for
    * every touched key, the upserted table must EQUAL the batch
    * aggregate over all events — a lost micro-batch, a stale (not
    * overwritten) key, or a dropped bucket all hash-fail against
    * DuckDB's batch restatement. */
  private val ev18StreamUpsert: Q = (s, dir) => {
    import org.apache.spark.sql.streaming.OutputMode
    val dayMs = 86400000L
    // Bench-time coarsening: update mode emits the COMPLETE new
    // aggregate for every touched key each batch, so the upserted
    // final table is slicing-invariant by construction (StreamingSpec
    // pins it); Verify never sets the knob.
    val bucketMs = math.max(1,
      sys.props.getOrElse("graft.replay.coarsen", "1").toInt) * 5 * dayMs
    val (files, landing) = stageReplay(s,
      t(s, dir, "events")
        .select(col("ts").cast("timestamp").as("ts"), col("event_type"),
          col("value"))
        .withColumn("b", expr(s"unix_millis(ts) div $bucketMs")))
    val schema = s.read.parquet(files.head.toString).schema
    val stateDir = java.nio.file.Files
      .createTempDirectory("ev18_upsert_").toString + "/state"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try s.readStream.schema(schema).parquet(landing)
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_raw"))
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          StreamDemo.upsertState(s, stateDir, batch,
            Seq("event_type", "day"), nBuckets = 8)
        }
        .start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try replay(files, landing, q) finally q.stop()
    s.read.parquet(stateDir)
      .select(col("event_type"), col("day"), col("n"),
        round(col("sum_raw"), 4).as("sum_value"))
      .orderBy(col("event_type"), col("day"))
  }

  /** EV31 ✱: STREAMING INGEST INTO THE PERSISTED IVF INDEX — the
    * ev×e3 composition closing the ANN loop the way ev28 closed the
    * snapshot-log loop: a day's new embeddings don't arrive as one
    * batch job, they arrive as a STREAM, and the index must absorb
    * them micro-batch by micro-batch with no retrain. The held-out
    * batch slice (vec_id ≡ 0 mod 4) replays as 4 micro-batches
    * through a landing dir; each foreachBatch body runs the
    * e3_ivf_incremental ingest — map-side assignment against the
    * FROZEN broadcast centroids, partition-local append into the cell
    * layout. Gates (✱, constant-true oracle): the grown index's
    * search EQUALS the in-memory cell path over the full corpus under
    * the same frozen centroids (a lost, duplicated, or mis-assigned
    * micro-batch breaks equality), recall of the exact top-5 clears
    * 0.5, and a require pins that the ingest really took ≥ 3
    * micro-batches. */
  private val ev31StreamIvfIngest: Q = (s, dir) => {
    import graft.ext.Similarity
    val emb = graft.Tables.load(s, dir, "embeddings")
    val resident = emb.filter(col("vec_id") % 4 =!= 0)
    val arriving = emb.filter(col("vec_id") % 4 === 0)
    val queries = emb.filter(col("vec_id") < 50)
    val cents = Similarity.ivfTrain(resident, c = 32, iters = 2) // frozen
    val path = graft.lake.Lake.scratchDir("ev31_ivf") + "/index"
    Similarity.ivfWriteIndex(resident, cents, path)
    val (files, landing) = stageReplay(s,
      arriving.select(col("vec_id"), col("embedding"))
        .withColumn("b", expr("(vec_id div 4) % 4")))
    val schema = s.read.parquet(files.head.toString).schema
    var batches = 0
    val q = s.readStream.schema(schema).parquet(landing)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches += 1
        Similarity.ivfAssign(batch, cents)
          .write.mode("append").partitionBy("cell").parquet(path)
      }
      .start()
    try replay(files, landing, q) finally q.stop()
    require(batches >= 3,
      s"ingest drained in $batches micro-batches — replay not exercised")
    val viaIndex = Similarity.ivfSearchIndex(s, path, queries, cents,
      k = 5, nprobe = 8)
    val inMemory = Similarity.ivfTopK(emb, queries, cents,
      k = 5, nprobe = 8)
    val extraAgg = viaIndex.exceptAll(inMemory)
      .agg(count(lit(1)).as("extra"))
    val missAgg = inMemory.exceptAll(viaIndex)
      .agg(count(lit(1)).as("missing"))
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select(col("q_id"), col("c_id"))
    val hitsAgg = exact.join(viaIndex.select(col("q_id"), col("c_id")),
      Seq("q_id", "c_id"), "left_semi").agg(count(lit(1)).as("hits"))
    val totalAgg = exact.agg(count(lit(1)).as("total"))
    extraAgg.crossJoin(missAgg).crossJoin(hitsAgg).crossJoin(totalAgg)
      .select(
        (col("extra") === 0 && col("missing") === 0)
          .as("ingest_equals_memory"),
        (col("hits").cast("double") / col("total") >= 0.5).as("recall_ok"),
        lit(batches >= 3).as("multi_batch"))
  }

  /** EV32 ✱: STREAMING INGEST INTO THE PERSISTED LSH SIGNATURE TABLE —
    * the e2 analog of [[ev31StreamIvfIngest]], closing the ev×e2 loop:
    * new documents arrive as a STREAM and the near-dup state must
    * absorb each admitted micro-batch with no corpus re-shingle.
    * The resident corpus signs into the cell-partitioned table once;
    * each foreachBatch body runs [[graft.ext.Dedup
    * .lshAdmitAgainstSignatures]] against the CURRENT persisted table
    * (band keys from STORED signatures — the asymmetric e2_incremental
    * join shape) and appends only the admitted rows' signature lines
    * back into the cell layout. Batches carry monotone id ranges
    * (the incremental-dedup id contract), so sequential admission is
    * well-defined. Gates (✱, constant-true oracle): the streamed
    * admitted set EQUALS a sequential in-memory replay of the same
    * admission over the same buckets (a lost, duplicated, reordered,
    * or un-appended micro-batch breaks equality — batch i's admission
    * depends on batch i−1's appends), the ingest took ≥ 3
    * micro-batches, and the mix actually exercised both paths
    * (some admitted, some rejected). */
  private val ev32StreamLshIngest: Q = (s, dir) => {
    import graft.ext.Dedup
    val (sn, kk, bb, th) = (3, 64, 16, 0.8)
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val resident = docs.filter(col("doc_id") % 4 =!= 0)
    // Arriving mix: novel texts (the held-out mod-4 slice), near-dups
    // of resident docs (one appended token), exact dups of resident
    // docs — each group in its own monotone id range.
    val arriving = docs.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 8 === 1)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" zzdup")).as("text")))
      .unionByName(docs.filter(col("doc_id") % 8 === 2)
        .select((col("doc_id") + 300000).as("doc_id"), col("text")))
    // Monotone-in-id buckets: each 100k group split in two (at +250),
    // so the replay is ≥ 3 micro-batches at every SF and ids only grow.
    val bExpr = (expr("doc_id div 100000") * 2 +
      when(pmod(col("doc_id"), lit(100000)) >= 250, 1).otherwise(0))
      .cast("long")
    val path = graft.lake.Lake.scratchDir("ev32_lsh") + "/sigs"
    Dedup.lshWriteSignatures(resident, "doc_id", "text", sn, kk, path)
    val (files, landing) = stageReplay(s, arriving.withColumn("b", bExpr))
    val schema = s.read.parquet(files.head.toString).schema
    var batches = 0
    val q = s.readStream.schema(schema).parquet(landing)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches += 1
        val admitted = Dedup.lshAdmitAgainstSignatures(
          s.read.parquet(path), batch, "doc_id", "text", sn, kk, bb, th)
        Dedup.lshSignatureTable(admitted, "doc_id", "text", sn, kk)
          .write.mode("append").partitionBy("cell").parquet(path)
      }
      .start()
    try replay(files, landing, q) finally q.stop()
    require(batches >= 3,
      s"ingest drained in $batches micro-batches — replay not exercised")
    // Sequential in-memory reference over the same buckets, in order.
    val bucketVals = arriving.select(bExpr.as("b"))
      .distinct().orderBy(col("b")).collect().map(_.getLong(0)) // ≤ 8
    var table = Dedup.lshSignatureTable(resident, "doc_id", "text",
      sn, kk).localCheckpoint(eager = false)
    var wanted: DataFrame = null
    bucketVals.foreach { b =>
      val bucket = arriving.filter(bExpr === b)
      val adm = Dedup.lshAdmitAgainstSignatures(table, bucket,
          "doc_id", "text", sn, kk, bb, th)
        .localCheckpoint(eager = false)
      wanted = if (wanted == null) adm else wanted.unionByName(adm)
      table = table.unionByName(
        Dedup.lshSignatureTable(adm, "doc_id", "text", sn, kk))
    }
    val streamed = s.read.parquet(path)
      .filter(col("id") >= 100000).select(col("id")) // doc 0 → 100000
    val wantedIds = wanted.select(col("doc_id").as("id"))
    val extra = streamed.exceptAll(wantedIds).agg(count(lit(1)).as("x"))
    val miss = wantedIds.exceptAll(streamed).agg(count(lit(1)).as("y"))
    val counts = wantedIds.agg(count(lit(1)).as("n_adm"))
      .crossJoin(arriving.agg(count(lit(1)).as("n_arr")))
    extra.crossJoin(miss).crossJoin(counts).select(
      (col("x") === 0 && col("y") === 0).as("stream_equals_sequential"),
      lit(batches >= 3).as("multi_batch"),
      (col("n_adm") > 0 && col("n_adm") < col("n_arr"))
        .as("mix_exercised"))
  }

  /** EV33 ✱: STREAMING CLUSTER-LABEL MAINTENANCE — the last e2
    * lifecycle edge: near-dup CLUSTER labels (not just the signature
    * table) stay current while documents arrive as a stream. Resident
    * corpus labels are computed once ([[graft.ext.Dedup
    * .connectedComponents]] over the exact trigram-Jaccard pairs);
    * each foreachBatch then (1) computes only the DELTA pairs — batch
    * docs vs the current persisted corpus plus batch-internal pairs,
    * via the asymmetric prefix-filter join — and (2) re-roots only the
    * touched components with [[graft.ext.Dedup
    * .connectedComponentsIncremental]], writing a new labels version
    * and appending the batch to the persisted corpus. No batch ever
    * re-pairs corpus×corpus — per-batch work scales with the batch's
    * true-duplicate mass, which is the 100 TB shape (a full CC rerun
    * per micro-batch is the non-starter).
    *
    * The arriving mix is engineered to exercise every maintenance
    * path, including the one e2_cluster_incremental cannot see in a
    * single batch: a planted BRIDGE doc merges two clusters that were
    * DISTINCT in the resident labels. For each planted source doc d
    * (≥16 words): resident gains {d+1 token} (cluster A with d) and
    * {d+half-junk, d+half-junk+1 token} (cluster B — J(d, d+n/2 junk)
    * = (n−2)/(1.5n) < 0.7 keeps A and B apart; the junk tokens embed
    * the doc id, so B joins nothing else). The streamed bridge
    * d+n/8-junk sits at J ≥ 0.72 to BOTH (its shingles are a prefix
    * subset of B-core's), so its batch must merge A∪B. Other batches
    * carry novel texts and exact copies (join-existing / first-pair
    * paths).
    *
    * Gates (✱, constant-true oracle): the final streamed labels EQUAL
    * a full [[graft.ext.Dedup.connectedComponents]] recompute over
    * corpus+all-batches BIT-FOR-BIT (any label the contraction gets
    * wrong, any delta pair a batch drops, any stale labels version
    * breaks equality); ≥ 3 micro-batches; and ≥ 1 final component
    * contains ≥ 2 distinct RESIDENT components (the merge really
    * happened through the stream). */
  private val ev33StreamClusterMaintain: Q = (s, dir) => {
    import graft.ext.Dedup
    val theta = 0.7
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val nw = size(split(col("text"), " "))
    // Planted slice: sources for the A/B/bridge construction.
    val planted = docs.filter(col("doc_id") % 16 === 3 && nw >= 16)
    // NB: junk text FIRST, id offset in a second select — aliasing
    // doc_id and referencing it in the same projection would resolve
    // the lambda's col("doc_id") to the lateral alias (the OFFSET id,
    // Spark 4 implicit lateral-column-alias resolution), silently
    // breaking the bCore/bridge junk-prefix identity.
    def junked(idOff: Long, m: org.apache.spark.sql.Column) =
      planted.select(col("doc_id"),
        concat(col("text"), lit(" "), array_join(
          transform(sequence(lit(1), m),
            i => concat(lit("qj"), col("doc_id"), lit("x"), i)),
          " ")).as("text"))
        .select((col("doc_id") + idOff).as("doc_id"), col("text"))
    val aTwin = planted.select((col("doc_id") + 400000L).as("doc_id"),
      concat(col("text"), lit(" zzqa")).as("text"))
    val bCore = junked(500000L, (nw / 2).cast("int"))
    val bTwin = bCore.select((col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" zzqb")).as("text"))
    val resident = docs.filter(col("doc_id") % 4 =!= 0)
      .unionByName(aTwin).unionByName(bCore).unionByName(bTwin)
      .localCheckpoint(eager = false)
    // Arriving stream: bridges, novel texts, exact copies — monotone
    // id groups, each split in two (≥ 6 micro-batches at every SF).
    val bridge = junked(700000L, greatest(lit(1), (nw / 8).cast("int")))
    val arriving = bridge
      .unionByName(docs.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 800000L).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 8 === 1)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
    val bExpr = (expr("doc_id div 100000") * 2 +
      when(pmod(col("doc_id"), lit(100000)) >= 250, 1).otherwise(0))
      .cast("long")
    val root = graft.lake.Lake.scratchDir("ev33_cc")
    val docsPath = s"$root/docs"
    resident.write.parquet(docsPath)
    val oldLabels = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(resident, "doc_id", "text",
        shingleN = 3, threshold = theta))
      .localCheckpoint(eager = true) // read per batch + by the gate
    oldLabels.write.parquet(s"$root/labels_0")
    val (files, landing) = stageReplay(s, arriving.withColumn("b", bExpr))
    val schema = s.read.parquet(files.head.toString).schema
    var batches = 0
    val q = s.readStream.schema(schema).parquet(landing)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val base = s.read.parquet(docsPath)
        val delta = Dedup.ngramJaccardPairsAgainst(base,
          batch.select(col("doc_id"), col("text")), "doc_id", "text",
          shingleN = 3, threshold = theta)
        val labels = Dedup.connectedComponentsIncremental(
          s.read.parquet(s"$root/labels_$batches"), delta)
        batches += 1
        labels.write.parquet(s"$root/labels_$batches")
        batch.select(col("doc_id"), col("text"))
          .write.mode("append").parquet(docsPath)
      }
      .start()
    try replay(files, landing, q) finally q.stop()
    require(batches >= 3,
      s"ingest drained in $batches micro-batches — replay not exercised")
    val streamed = s.read.parquet(s"$root/labels_$batches")
    val full = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(resident.unionByName(arriving),
        "doc_id", "text", shingleN = 3, threshold = theta))
    val extra = streamed.exceptAll(full).agg(count(lit(1)).as("x"))
    val miss = full.exceptAll(streamed).agg(count(lit(1)).as("y"))
    val mergedAgg = streamed
      .join(oldLabels.select(col("id"), col("comp").as("old_comp")),
        Seq("id"))
      .groupBy(col("comp"))
      .agg(countDistinct(col("old_comp")).as("n_old"))
      .agg(max(col("n_old")).as("max_old"))
    extra.crossJoin(miss).crossJoin(mergedAgg).select(
      (col("x") === 0 && col("y") === 0).as("stream_equals_full"),
      lit(batches >= 3).as("multi_batch"),
      (col("max_old") >= 2).as("merged_across_clusters"))
  }

  /** EV34: STREAMING PRIORITY SAMPLE — the bounded-state form of
    * [[graft.ext.TrainPrep]]'s e8_priority_sample, and the shape a
    * 100 TB sampler actually runs: because priority order is a pure
    * per-row function of (id, weight), the per-lang top-(k+1) set is
    * MERGEABLE — top(A ∪ B) = top(top(A) ∪ B) — so each micro-batch
    * folds into ≤ (k+1) keyed rows per group and the state never
    * grows with the corpus (contrast ev32's LSH table, which must
    * retain every admitted signature). The whole corpus streams in
    * ≥ 3 micro-batches; each foreachBatch unions the persisted state
    * with the batch's keyed rows, re-ranks, and writes the new
    * top-(k+1) version. Arrival order is irrelevant by construction —
    * no monotone-id contract needed, ties break on id identically in
    * any batch split.
    *
    * Gate: the FULL e8_priority_sample value oracle verbatim — the
    * final state must finish into exactly the batch query's sample,
    * rank order, τ, and estimator values over the whole corpus. A
    * dropped batch, a lost state version, or a non-mergeable
    * tie-break all hash-fail against DuckDB. */
  private val ev34StreamPrioritySample: Q = (s, dir) => {
    import graft.ext.TrainPrep
    val k = 32
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val bExpr = pmod(col("doc_id"), lit(6L))
    val root = graft.lake.Lake.scratchDir("ev34_psample")
    val (files, landing) = stageReplay(s, docs.withColumn("b", bExpr))
    val schema = s.read.parquet(files.head.toString).schema
    var batches = 0
    val q = s.readStream.schema(schema).parquet(landing)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val keyedBatch = TrainPrep.priorityKeyed(
          batch.select(col("doc_id"), col("lang"), col("n_chars")))
        val state =
          if (batches == 0) keyedBatch
          else s.read.parquet(s"$root/state_$batches")
            .unionByName(keyedBatch)
        batches += 1
        TrainPrep.priorityTop(state, k)
          .select(col("lang"), col("doc_id"), col("w"), col("u"))
          .write.parquet(s"$root/state_$batches")
      }
      .start()
    try replay(files, landing, q) finally q.stop()
    require(batches >= 3,
      s"ingest drained in $batches micro-batches — replay not exercised")
    TrainPrep.priorityFinish(
      TrainPrep.priorityTop(s.read.parquet(s"$root/state_$batches"), k), k)
      .orderBy(col("lang"), col("rn"))
  }

  /** EV19: bounded-batch BACKFILL with Trigger.AvailableNow — the
    * catch-up surface: a backlog of landed files is drained in
    * rate-limited micro-batches (`maxFilesPerTrigger`) and the query
    * STOPS when the backlog is empty, instead of either one giant
    * batch (OOM at 100 TB of backlog) or a never-terminating stream.
    * Documents land as 16 parquet fragments; the stream reads ≤ 4
    * files per trigger into the update-mode (lang) aggregation and
    * MERGEs each batch through [[StreamDemo.upsertState]] — `require`
    * asserts the drain really took multiple bounded batches. The final
    * state table must equal the batch aggregate (DuckDB-restated):
    * a dropped fragment, a double-processed batch, or a stale key all
    * hash-fail. */
  private val ev19StreamBackfill: Q = (s, dir) => {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files
      .createTempDirectory("ev19_backfill_").toString
    val (landing, stateDir) = (s"$root/landing", s"$root/state")
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.repartition(16).write.parquet(landing)
    var batches = 0
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try s.readStream
        .schema(s.read.parquet(landing).schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(landing)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batches += 1
          StreamDemo.upsertState(s, stateDir, batch, Seq("lang"), 4)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try q.awaitTermination() finally q.stop()
    require(batches >= 3,
      s"backfill drained in $batches batches — rate limit not applied")
    s.read.parquet(stateDir)
      .select(col("lang"), col("n_docs"), col("sum_chars"))
      .orderBy(col("lang"))
  }

  /** EV20: EXACTLY-ONCE ACROSS A RESTART, oracle-gated — the recovery
    * surface every production stream lives on: a first query drains
    * batch 1 of the landing dir through a checkpointed parquet file
    * sink and STOPS; a SECOND query object (fresh `start()`, same
    * checkpoint + sink) finds batch 2 and must resume FROM THE
    * CHECKPOINTED OFFSETS — reprocessing nothing, losing nothing. The
    * parquet sink's `_spark_metadata` commit log is what makes the
    * readback transactional. The gate reads the sink and rolls up per
    * lang: a double-processed batch-1 file (lost offsets) or a skipped
    * batch-2 file both hash-fail against DuckDB's whole-table
    * restatement. The streaming twin of `k12_bookmark`. */
  private val ev20StreamRestart: Q = (s, dir) => {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files
      .createTempDirectory("ev20_restart_").toString
    val (landing, sink, ckpt) =
      (s"$root/landing", s"$root/sink", s"$root/ckpt")
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.filter(col("doc_id") % 2 === 0)
      .repartition(4).write.mode("append").parquet(landing)
    val schema = s.read.parquet(landing).schema
    def run(): Unit = {
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q =
        try s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "2").parquet(landing)
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      try q.awaitTermination() finally q.stop()
    }
    run() // first life: drains batch 1, checkpoints, stops
    docs.filter(col("doc_id") % 2 =!= 0)
      .repartition(4).write.mode("append").parquet(landing)
    run() // second life: must process ONLY the new files
    s.read.parquet(sink)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** EV16: foreachBatch MULTI-SINK ROUTING executed as a stream — the
    * streaming WRITE surface the other gates don't touch. Documents
    * arrive in three mod-3 micro-batches; [[StreamDemo.routeByLang]]
    * tags each with its predicted language (map-only, stateless ⇒
    * exact), and the foreachBatch sink appends each micro-batch to a
    * parquet lake `partitionBy("pred")` — one stream fanning out to one
    * destination directory per language. The gate reads the lake back
    * and rolls up (pred → n_docs, Σ doc_id): a lost micro-batch, a
    * double-written batch, or a row routed to the wrong partition all
    * hash-fail. DuckDB recomputes the routing argmax exactly
    * (zero-padded score-string greatest = struct comparison). */
  private val ev16StreamRoute: Q = (s, dir) => {
    // Three micro-batches keyed by doc_id mod 3 — the routing is
    // map-only/stateless, so the fan-out is batching-independent.
    val (files, landing) = stageReplay(s,
      t(s, dir, "documents")
        .select((col("doc_id") % 3).as("b"), col("doc_id"), col("text")))
    val schema = s.read.parquet(files.head.toString).schema
    val lake = java.nio.file.Files
      .createTempDirectory("ev16_route_").toString
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try StreamDemo.routeByLang(
          s.readStream.schema(schema).parquet(landing))
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").partitionBy("pred").parquet(lake)
        }
        .start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try replay(files, landing, q) finally q.stop()
    s.read.parquet(lake)
      .groupBy(col("pred"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
      .orderBy(col("pred"))
  }

  /** EV21: the ev12 sessionization replay EXECUTED ON THE ROCKSDB
    * STATE STORE — the off-heap, incremental-checkpoint state backend
    * a 100 TB streaming deployment runs on (the default HDFS-backed
    * provider holds every key on the executor heap; RocksDB spills to
    * local disk and snapshots incrementally). The provider is scoped
    * to this query and restored (a streaming query pins its provider
    * at first start), and the result must hash-match ev12's oracle:
    * state-backend choice is an EXECUTION concern, never a semantics
    * one — any divergence (lost state across micro-batches, timeout
    * misfire) fails the same batch gaps-and-islands oracle. */
  private val ev21RocksdbSessions: Q = (s, dir) =>
    withRocksDb(s)(ev12StreamSessions(s, dir))

  /** EV27: the ev26 cross-batch declarative dedup on the ROCKSDB state
    * store — the backend×operator matrix cell that pairs with ev21
    * (sessionization already has HDFS-heap and RocksDB runs pinned to
    * one oracle; dedup now does too). `dropDuplicatesWithinWatermark`
    * keeps its digest state in RocksDB across the same replayed
    * micro-batches, and the surviving set must hash-match the same
    * distinct-digest oracle: state-backend choice is execution, not
    * semantics — the off-heap backend a 100 TB dedup state actually
    * needs. */
  private val ev27RocksdbDropdup: Q = (s, dir) =>
    withRocksDb(s)(ev26StreamDropdup(s, dir))

  /** Scope the RocksDB state store provider to `body` and restore the
    * previous provider after (a streaming query pins its provider at
    * first start, so the toggle only affects queries started inside). */
  private def withRocksDb(s: SparkSession)(body: => DataFrame): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** EV22: the same sessionization gate on Spark 4's
    * `transformWithState` API ([[StreamDemo.sessionizeTws]] — typed
    * ValueState + explicit event-time timers, the
    * flatMapGroupsWithState successor built for the RocksDB backend's
    * virtual column families; the provider is required, so the gate
    * runs under [[withRocksDb]]). Must hash-match the SAME batch
    * gaps-and-islands oracle as ev12/ev21: three state APIs, one
    * semantics — a timer/state divergence in the new API (stale-timer
    * close, lost delete) fails the oracle, and the ev12↔ev22 pairing
    * pins the old and new API against each other every round. */
  private val ev22TwsSessions: Q = (s, dir) =>
    withRocksDb(s)(sessionGate(s, dir,
      StreamDemo.sessionizeTws(_, 86400000L)))

  /** EV23: the same sessionization gate on the DECLARATIVE built-in
    * `session_window` aggregation ([[StreamDemo.sessionizeNative]]) —
    * the fourth implementation under the one gaps-and-islands oracle,
    * and the Spark-first one: no state function, the engine merges
    * per-event `[ts, ts+gap)` windows by value overlap
    * (MergingSessionsExec), so correctness needs NO exact-gap batch
    * contract. flatMapGroupsWithState (ev12), RocksDB (ev21),
    * transformWithState (ev22) and session_window (ev23) must all
    * hash-match the same batch answer; a merge-boundary divergence
    * (native merges on overlap — an exactly-gap-apart pair would split
    * where the `> gap` oracle keeps it; the events table has zero such
    * pairs at every SF, checked) would surface here first. */
  private val ev23SessionWindow: Q = (s, dir) =>
    sessionGate(s, dir, StreamDemo.sessionizeNative(_, 86400000L))

  /** EV24: row-level CDC apply with DELETES — the Debezium-feed
    * surface ev18's aggregate upsert doesn't cover: a change stream
    * whose rows are upserts or TOMBSTONES, applied to a keyed state
    * table where the last op per key wins and a delete RETIRES the
    * key. Ops derive deterministically from the data (a (user, day)
    * hash marks delete days), events replay in 5-day buckets, and each
    * micro-batch is reduced to its last op per user (event-time order,
    * event_id tie-break — the caller-owned reduction
    * [[StreamDemo.applyCdcState]] requires) before the bucket-scoped
    * apply. Because buckets partition time, batch k's winner always
    * out-times batch j<k's state row, so the final table must hold
    * exactly each user's GLOBALLY last op — if an upsert: its row; if
    * a tombstone: nothing. The oracle restates that directly
    * (row_number over the whole table); a resurrected deleted key, a
    * stale overwrite, or a lost tombstone all hash-fail. */
  private val ev24StreamCdc: Q = (s, dir) => {
    val dayMs = 86400000L
    // Bench-time coarsening: keep-latest-per-key CDC state depends on
    // event-time order, not batch slicing (StreamingSpec pins it);
    // Verify never sets the knob.
    val bucketMs = math.max(1,
      sys.props.getOrElse("graft.replay.coarsen", "1").toInt) * 5 * dayMs
    val (files, landing) = stageReplay(s,
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp").as("ts"), col("value"))
        .withColumn("b", expr(s"unix_millis(ts) div $bucketMs")))
    val schema = s.read.parquet(files.head.toString).schema
    val stateDir = java.nio.file.Files
      .createTempDirectory("ev24_cdc_").toString + "/state"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try s.readStream.schema(schema).parquet(landing)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val day = datediff(col("ts").cast("date"),
            to_date(lit("1970-01-01")))
          val w = Window.partitionBy(col("user_id"))
            .orderBy(col("ts").desc, col("event_id").desc)
          val latest = batch
            .withColumn("op",
              when(pmod(col("user_id") + day, lit(11)) === 0, lit("d"))
                .otherwise(lit("u")))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(col("user_id"), col("ts"), col("value"), col("op"))
          StreamDemo.applyCdcState(s, stateDir, latest, "op",
            Seq("user_id"), nBuckets = 8)
        }
        .start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try replay(files, landing, q) finally q.stop()
    s.read.parquet(stateDir)
      .select(col("user_id"), unix_millis(col("ts")).as("last_ms"),
        round(col("value"), 4).as("last_value"))
      .orderBy(col("user_id"))
  }

  /** EV28: STREAMING INGEST INTO THE ACID SNAPSHOT LOG — the
    * Delta-streaming-sink pattern that closes the loop between the
    * streaming (ev*) and lakehouse (k*) families: each micro-batch
    * commits as a table VERSION through
    * [[graft.lake.Snapshots.commitStreamBatch]], whose commit marker
    * doubles as the idempotency ledger. The replay drives one
    * micro-batch per 5-day event bucket, and EVERY batch is delivered
    * TWICE (the foreachBatch body immediately re-runs itself —
    * modeling the at-least-once redelivery a restarted checkpointed
    * stream performs); the duplicate must be a no-op, `require`d
    * batch-by-batch. The result reads every committed version back
    * THROUGH the log — version v = batch v−1 = the v-th event bucket
    * — and the oracle restates each version's rollup from the raw
    * table via dense_rank over the bucket expression, so a dropped
    * batch, a double-committed batch, or rows leaking across versions
    * all hash-fail. At 100 TB this is exactly-once streaming ingest
    * with time travel for free; nothing here is driver-sized except
    * the marker files. */
  private val ev28StreamTxnSink: Q = (s, dir) => {
    val dayMs = 86400000L
    val (files, landing) = stageReplay(s,
      t(s, dir, "events")
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
          col("value"))
        .withColumn("b", expr(s"unix_millis(ts) div ${5 * dayMs}")))
    val schema = s.read.parquet(files.head.toString).schema
    val root = graft.lake.Lake.scratchDir("ev28") + "/table"
    var committed = 0
    var duplicates = 0
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try s.readStream.schema(schema).parquet(landing)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          def attempt(): Boolean =
            graft.lake.Snapshots.commitStreamBatch(root, batchId)(p =>
              batch.write.mode("overwrite").parquet(p))
          if (attempt()) committed += 1
          // at-least-once redelivery, immediately: must be a no-op
          require(!attempt(),
            s"duplicate delivery of batch $batchId committed twice")
          duplicates += 1
          ()
        }
        .start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try replay(files, landing, q) finally q.stop()
    require(committed == files.size && duplicates == files.size,
      s"committed $committed, duplicates $duplicates of ${files.size}")
    require(graft.lake.Snapshots.latestVersion(root) == files.size,
      "version count diverged from batch count")
    (1 to files.size).map { v =>
      graft.lake.Snapshots.readVersion(s, root, Some(v))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).as("sum_ids"),
          round(sum(col("value")), 4).as("sum_value"))
        .select(lit(v).as("version"), col("n_events"), col("sum_ids"),
          col("sum_value"))
    }.reduce(_.unionByName(_)).orderBy(col("version"))
  }

  val queries: Map[String, Q] = Map(
    "ev28_stream_txn_sink" -> ev28StreamTxnSink,
    "ev24_stream_cdc" -> ev24StreamCdc,
    "ev23_session_window" -> ev23SessionWindow,
    "ev22_tws_sessions" -> ev22TwsSessions,
    "ev21_rocksdb_sessions" -> ev21RocksdbSessions,
    "ev17_stream_left_join" -> ev17StreamLeftJoin,
    "ev25_stream_full_join" -> ev25StreamFullJoin,
    "ev16_stream_route" -> ev16StreamRoute,
    "ev18_stream_upsert" -> ev18StreamUpsert,
    "ev19_stream_backfill" -> ev19StreamBackfill,
    "ev20_stream_restart" -> ev20StreamRestart,
    "ev15_stream_semdedup" -> ev15StreamSemdedup,
    "ev14_stream_windows" -> ev14StreamWindows,
    "ev13_stream_join" -> ev13StreamJoin,
    "ev12_stream_sessions" -> ev12StreamSessions,
    "ev11_stream_dedup" -> ev11StreamDedup,
    "ev26_stream_dropdup" -> ev26StreamDropdup,
    "ev29_stream_url_dedup" -> ev29StreamUrlDedup,
    "ev30_stream_hll" -> ev30StreamHll,
    "ev31_stream_ivf_ingest" -> ev31StreamIvfIngest,
    "ev32_stream_lsh_ingest" -> ev32StreamLshIngest,
    "ev33_stream_cluster_maintain" -> ev33StreamClusterMaintain,
    "ev34_stream_priority_sample" -> ev34StreamPrioritySample,
    "ev27_rocksdb_dropdup" -> ev27RocksdbDropdup,
    "ev10_burstiness" -> ev10Burstiness,
    "ev9_attribution" -> ev9Attribution,
    "ev1_tumbling" -> ev1Tumbling,
    "ev2_session" -> ev2Session,
    "ev3_sliding" -> ev3Sliding,
    "ev4_resample" -> ev4Resample,
    "ev5_funnel" -> ev5Funnel,
    "ev6_retention" -> ev6Retention,
    "ev7_markov" -> ev7Markov,
    "ev8_anomaly" -> ev8Anomaly,
  )

  val oracles: Map[String, String] = Map(
    // Self-check (✱): index equality / recall bounds asserted in-plan.
    "ev31_stream_ivf_ingest" ->
      """SELECT true AS ingest_equals_memory, true AS recall_ok,
        |  true AS multi_batch""".stripMargin,
    // Self-check ✱: streamed LSH-table ingest equals the sequential
    // in-memory admission over the same monotone-id buckets.
    "ev32_stream_lsh_ingest" ->
      """SELECT true AS stream_equals_sequential, true AS multi_batch,
        |  true AS mix_exercised""".stripMargin,
    "ev33_stream_cluster_maintain" ->
      """SELECT true AS stream_equals_full, true AS multi_batch,
        |  true AS merged_across_clusters""".stripMargin,
    // The FULL batch priority-sample oracle verbatim: the streamed
    // bounded state must finish into the identical sample/τ/estimator.
    "ev34_stream_priority_sample" ->
      """WITH w AS (
        |  SELECT lang, doc_id,
        |    least(n_chars, 1048576)::BIGINT AS w,
        |    ((((doc_id % 2147483648) * 2654435761) % 4294967296) + 1)::BIGINT AS u
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, w, u,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY (w * 4294967296)::DOUBLE / u::DOUBLE DESC, doc_id) AS rn
        |  FROM w),
        |tau AS (
        |  SELECT lang,
        |    ((w::HUGEINT * 4294967296 * 1000000) // u::HUGEINT)::BIGINT AS tau_micro
        |  FROM r WHERE rn = 33)
        |SELECT r.lang, r.rn, r.doc_id,
        |  (r.w * 1000000)::BIGINT AS w_micro,
        |  greatest(r.w * 1000000, coalesce(t.tau_micro, 0))::BIGINT AS est_micro
        |FROM r LEFT JOIN tau t ON r.lang = t.lang
        |WHERE r.rn <= 32
        |ORDER BY r.lang, r.rn""".stripMargin,
    // Each committed version = one 5-day event bucket, in bucket
    // order: dense_rank over the SAME bucket expression restates the
    // version ↦ rows mapping from the raw table.
    "ev28_stream_txn_sink" ->
      """WITH e AS (
        |  SELECT event_id, value,
        |    epoch_ms(ts) // 432000000 AS b
        |  FROM events),
        |v AS (
        |  SELECT event_id, value,
        |    dense_rank() OVER (ORDER BY b) AS version
        |  FROM e)
        |SELECT version, count(*)::BIGINT AS n_events,
        |  sum(event_id)::BIGINT AS sum_ids,
        |  round(sum(value), 4) AS sum_value
        |FROM v GROUP BY version ORDER BY version""".stripMargin,
    // Whole-table restatement of last-op-wins CDC: each user's
    // globally last event (ts, then event_id) decides — an upsert
    // keeps its row, a tombstone removes the key.
    "ev24_stream_cdc" ->
      """WITH e AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN (user_id + (ts::DATE - DATE '1970-01-01')) % 11 = 0
        |         THEN 'd' ELSE 'u' END AS op
        |  FROM events),
        |r AS (
        |  SELECT user_id, ts, value, op,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM e)
        |SELECT user_id, epoch_ms(ts)::BIGINT AS last_ms,
        |  round(value, 4) AS last_value
        |FROM r WHERE rn = 1 AND op = 'u'
        |ORDER BY user_id""".stripMargin,
    // Same gaps-and-islands restatement as ev12/ev21/ev22: the
    // declarative session_window operator must agree with every
    // custom-state implementation.
    "ev23_session_window" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |d AS (
        |  SELECT user_id, ms,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
        |           IS NULL
        |         OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
        |           > 86400000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT user_id, ms,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  min(ms)::BIGINT AS start_ms, max(ms)::BIGINT AS end_ms
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_ms""".stripMargin,
    // Same batch gaps-and-islands restatement as ev12: the state
    // backend must be semantics-invisible.
    // Same restatement as ev12/ev21: the transformWithState API must
    // be semantics-identical to flatMapGroupsWithState.
    "ev22_tws_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |d AS (
        |  SELECT user_id, ms,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
        |           IS NULL
        |         OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
        |           > 86400000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT user_id, ms,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  min(ms)::BIGINT AS start_ms, max(ms)::BIGINT AS end_ms
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_ms""".stripMargin,
    "ev21_rocksdb_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |d AS (
        |  SELECT user_id, ms,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
        |           IS NULL
        |         OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
        |           > 86400000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT user_id, ms,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  min(ms)::BIGINT AS start_ms, max(ms)::BIGINT AS end_ms
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_ms""".stripMargin,
    // Whole-table restatement: exactly-once across the restart means
    // the sink holds every document exactly once.
    "ev20_stream_restart" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS sum_chars
        |FROM documents GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // Batch restatement of the drained backfill state table.
    "ev19_stream_backfill" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS sum_chars
        |FROM documents GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // Batch restatement of the streamed upsert state table: update-mode
    // emissions upserted per key must equal the full batch aggregate.
    "ev18_stream_upsert" ->
      """SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS n,
        |  round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,
    // Batch restatement of the streamed routing fan-out: the argmax is
    // replicated from the SAME marker constant as the engine side.
    "ev16_stream_route" ->
      s"""WITH p AS (
         |  SELECT doc_id, ${graft.ext.TextStats.langidBestSql} AS best
         |  FROM documents),
         |r AS (
         |  SELECT doc_id,
         |    ${graft.ext.TextStats.langidPredSql} AS pred
         |  FROM p)
         |SELECT pred, count(*)::BIGINT AS n_docs,
         |  sum(doc_id)::BIGINT AS sum_ids
         |FROM r GROUP BY pred ORDER BY pred""".stripMargin,
    // Exact batch anti-join restatement of the streamed semantic dedup
    // (raw-dot threshold, both engines sum left-to-right over the same
    // doubles — the e3_cosine_neardup parity convention).
    "ev15_stream_semdedup" ->
      """WITH c AS (
        |  SELECT embedding::DOUBLE[] AS cv,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      AS cnrm
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |f AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      AS nrm
        |  FROM embeddings WHERE vec_id % 5 <> 0)
        |SELECT vec_id FROM f
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM c
        |  WHERE list_dot_product(f.v, c.cv) / (f.nrm * c.cnrm) >= 0.45)
        |ORDER BY vec_id""".stripMargin,
    // Batch tumbling restatement of the append-mode streamed windows
    // (windowedCounts rounds sums to 4 decimals).
    "ev14_stream_windows" ->
      """SELECT time_bucket(INTERVAL '1 day', ts) AS ws, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY ws, event_type
        |ORDER BY ws, event_type""".stripMargin,
    // Batch LEFT JOIN restatement of the streamed outer interval join;
    // NULLS FIRST pins DuckDB's ordering to Spark's ascending default.
    "ev17_stream_left_join" ->
      """SELECT i.ad, epoch_us(i.ts) AS imp_us, epoch_us(c.ts) AS click_us
        |FROM (SELECT user_id % 50 AS ad, ts FROM events
        |      WHERE event_type = 'view') i
        |LEFT JOIN (SELECT user_id % 50 AS ad, ts FROM events
        |           WHERE event_type = 'click') c
        |  ON i.ad = c.ad AND c.ts >= i.ts
        | AND c.ts <= i.ts + INTERVAL 1 HOUR
        |ORDER BY i.ad, imp_us, click_us NULLS FIRST""".stripMargin,
    // Batch FULL JOIN restatement of the streamed full-outer interval
    // join; the coalesced ad keys rows that exist on only one side.
    "ev25_stream_full_join" ->
      """SELECT coalesce(i.ad, c.ad) AS ad,
        |  epoch_us(i.ts) AS imp_us, epoch_us(c.ts) AS click_us
        |FROM (SELECT user_id % 50 AS ad, ts FROM events
        |      WHERE event_type = 'view') i
        |FULL JOIN (SELECT user_id % 50 AS ad, ts FROM events
        |           WHERE event_type = 'click') c
        |  ON i.ad = c.ad AND c.ts >= i.ts
        | AND c.ts <= i.ts + INTERVAL 1 HOUR
        |ORDER BY ad, imp_us NULLS FIRST, click_us NULLS FIRST""".stripMargin,
    // Batch restatement of the streamed interval join: clicks within
    // one hour AFTER a same-ad impression (ad = user_id % 50).
    "ev13_stream_join" ->
      """SELECT i.ad, epoch_us(i.ts) AS imp_us, epoch_us(c.ts) AS click_us
        |FROM (SELECT user_id % 50 AS ad, ts FROM events
        |      WHERE event_type = 'view') i
        |JOIN (SELECT user_id % 50 AS ad, ts FROM events
        |      WHERE event_type = 'click') c
        |  ON i.ad = c.ad AND c.ts >= i.ts
        | AND c.ts <= i.ts + INTERVAL 1 HOUR
        |ORDER BY i.ad, imp_us, click_us""".stripMargin,
    // Batch gaps-and-islands restatement of the streamed sessionization
    // (1-day gap, epoch-ms domain on both engines: SessionOut carries
    // java.sql.Timestamp.getTime millis).
    "ev12_stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |d AS (
        |  SELECT user_id, ms,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
        |           IS NULL
        |         OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
        |           > 86400000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT user_id, ms,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  min(ms)::BIGINT AS start_ms, max(ms)::BIGINT AS end_ms
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_ms""".stripMargin,
    // Batch restatement of the stream: a digest survives iff it is not
    // in the mod-5 corpus (the in-stream repeat suppression collapses
    // to DISTINCT once the stream is driven to completion).
    "ev11_stream_dedup" ->
      """SELECT DISTINCT sha256(text) AS digest
        |FROM documents
        |WHERE sha256(text) NOT IN (
        |  SELECT sha256(text) FROM documents WHERE doc_id % 5 = 0)
        |ORDER BY digest""".stripMargin,
    // Batch restatement of the replayed stream: once every batch has
    // drained, first-arrival-wins dedup over base + replayed copies
    // collapses to DISTINCT over the corpus (replays carry identical
    // text, hence identical digests).
    "ev26_stream_dropdup" ->
      """SELECT DISTINCT sha256(text) AS digest
        |FROM documents ORDER BY digest""".stripMargin,
    // Distinct CANONICAL urls of the base plant — the +455 revisits
    // share every content modulus (455 = 7·13·5), so a correct
    // Exact distinct counts value-gated; the sketch estimate bound is
    // asserted in-plan (✱ — sketch registers are engine-specific).
    "ev30_stream_hll" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact,
        |  true AS all_events_seen, true AS estimate_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // canonical dedup adds no row for them; a leaked variant makes the
    // stream emit MORE rows and hash-fail.
    "ev29_stream_url_dedup" ->
      s"""WITH planted AS (
         |  SELECT
         |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.EXAMPLE'
         |          ELSE 'https://www.example' END) ||
         |    (doc_id % 7) ||
         |    (CASE WHEN doc_id % 2 = 0 THEN '.COM' ELSE '.com' END) ||
         |    ':443/path/../p' || (doc_id % 13) || '/?utm_source=x' ||
         |    (CASE WHEN doc_id % 3 = 0 THEN '&utm_campaign=y'
         |          ELSE '' END) ||
         |    '&id=' || (doc_id % 5) || '#s' || (doc_id % 4) AS url
         |  FROM documents),
         |c AS (
         |  SELECT
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |      regexp_replace(
         |        lower(regexp_extract(url, '${graft.ext.Hygiene.UrlSchemeHostRe}', 1)) ||
         |          regexp_replace(url, '${graft.ext.Hygiene.UrlAfterHostRe}', '', 'g'),
         |      '${graft.ext.Hygiene.UrlFragmentRe}', '', 'g'),
         |      '${graft.ext.Hygiene.UrlUtmRe}', '', 'g'),
         |      '${graft.ext.Hygiene.UrlTrailSepRe}', '', 'g'),
         |      '${graft.ext.Hygiene.UrlPortRe}', '/', 'g'),
         |      '${graft.ext.Hygiene.UrlDotSegRe}', '/', 'g') AS canon
         |  FROM planted)
         |SELECT DISTINCT canon FROM c ORDER BY canon""".stripMargin,
    // Same oracle as ev26: the RocksDB run must be indistinguishable.
    "ev27_rocksdb_dropdup" ->
      """SELECT DISTINCT sha256(text) AS digest
        |FROM documents ORDER BY digest""".stripMargin,
    "ev10_burstiness" ->
      """WITH g AS (
        |  SELECT user_id,
        |    (epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
        |       PARTITION BY user_id ORDER BY ts, event_id)))
        |      / 1000000.0 AS gap_s
        |  FROM events),
        |st AS (
        |  SELECT user_id, count(*)::BIGINT AS n_gaps,
        |    round(avg(gap_s), 4) AS mean_gap_s,
        |    round(stddev_samp(gap_s), 4) AS sd_gap_s
        |  FROM g WHERE gap_s IS NOT NULL
        |  GROUP BY user_id HAVING count(*) >= 2)
        |SELECT user_id, n_gaps, mean_gap_s, sd_gap_s,
        |  round((sd_gap_s - mean_gap_s) / (sd_gap_s + mean_gap_s), 4)
        |    AS burstiness
        |FROM st ORDER BY user_id""".stripMargin,
    "ev9_attribution" ->
      """WITH t AS (
        |  SELECT event_type, value,
        |    first_value(CASE WHEN event_type IN ('view','click','signup')
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS first_touch,
        |    last_value(CASE WHEN event_type IN ('view','click','signup')
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_touch
        |  FROM events)
        |SELECT first_touch, last_touch, count(*) AS n_purchases,
        |  round(sum(value), 4) AS revenue
        |FROM t WHERE event_type = 'purchase' AND last_touch IS NOT NULL
        |GROUP BY first_touch, last_touch
        |ORDER BY first_touch, last_touch""".stripMargin,
    "ev5_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t_view
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
        |  GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT '1_view' AS stage, count(*)::BIGINT AS n_users,
        |    sum(user_id)::BIGINT AS sum_users FROM s1
        |  UNION ALL SELECT '2_click', count(*)::BIGINT,
        |    sum(user_id)::BIGINT FROM s2
        |  UNION ALL SELECT '3_purchase', count(*)::BIGINT,
        |    sum(user_id)::BIGINT FROM s3)
        |ORDER BY stage""".stripMargin,
    "ev6_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
        |SELECT c.cohort_day,
        |  date_diff('day', c.cohort_day, a.day) AS offset_days,
        |  count(*)::BIGINT AS n_active
        |FROM cohort c JOIN active a USING (user_id)
        |WHERE date_diff('day', c.cohort_day, a.day) BETWEEN 0 AND 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev7_markov" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS next,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events),
        |pairs AS (
        |  SELECT prev, next, count(*) AS n FROM seq
        |  WHERE prev IS NOT NULL GROUP BY prev, next)
        |SELECT prev, next, n::BIGINT AS n,
        |  round(n::DOUBLE / sum(n) OVER (PARTITION BY prev), 6) AS p
        |FROM pairs ORDER BY prev, next""".stripMargin,
    "ev8_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
        |  FROM events GROUP BY event_type, day),
        |st AS (
        |  SELECT event_type, day, n,
        |    avg(n) OVER (PARTITION BY event_type) AS mu,
        |    stddev_pop(n) OVER (PARTITION BY event_type) AS sigma
        |  FROM daily)
        |SELECT event_type, day, n::BIGINT AS n,
        |  round(mu, 4) AS mu, round(sigma, 4) AS sigma
        |FROM st WHERE n > mu + 2.0 * sigma
        |ORDER BY event_type, day""".stripMargin,
    "ev4_resample" ->
      """WITH grid AS (
        |  SELECT u.user_id, d.day
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-07',
        |    INTERVAL 1 DAY)) AS day) d),
        |actual AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    count(*) AS n, round(sum(value), 4) AS sum_value
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY user_id, day)
        |SELECT g.user_id, g.day,
        |  coalesce(a.n, 0)::BIGINT AS n,
        |  coalesce(a.sum_value, 0.0) AS sum_value
        |FROM grid g LEFT JOIN actual a USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,
    "ev1_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 day', ts) AS ws, event_type,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,
    // Gaps-and-islands replica of session_window semantics: a new
    // session starts when the gap from the previous event is >= 6h.
    "ev2_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL '6 hours' THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, epoch_us(min(ts)) AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // Each event belongs to the window starting at its own day and the
    // one starting the day before (2-day width, 1-day slide).
    "ev3_sliding" ->
      """SELECT ws, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM (
        |  SELECT unnest([date_trunc('day', ts),
        |                 date_trunc('day', ts) - INTERVAL 1 DAY]) AS ws,
        |         value
        |  FROM events)
        |GROUP BY ws ORDER BY ws""".stripMargin,
  )
}
