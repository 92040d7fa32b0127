package graft

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** SF-slope guard over the committed bench artifact (round-9 verdict
  * item 6): `graft.Bench` times each family head at sf0.01 AND sf0.1
  * in one session and records e = log₁₀(t_large/t_small) against the
  * 10× row ratio. This spec bounds the measured exponent for the
  * BUCKETED families — the ones whose candidate generation is an
  * equi-join on banded/blocked keys and must scale ~linearly (plus log
  * factors): a super-linear reading means a bucket degenerated into
  * all-pairs or a shuffle started dominating, which is exactly the
  * 100 TB failure mode the plan-shape argument claims cannot happen.
  *
  * The bound is generous (1.45 ≈ n^1.45 ≈ 28× time per 10× rows) for
  * three reasons: single-rep timings on a throttling VM, fixed
  * per-query overhead that inflates t_small (deflating e) unevenly,
  * and the LSH families' genuine O(n · bucket-size) tail growth at a
  * fixed band plan. Quadratic (e = 2) and beyond stays far outside it.
  * Turning-the-knob evidence: an all-pairs cosine join measures
  * e ≈ 1.9-2.0 on this data — comfortably caught.
  */
class ScalingSpec extends SparkSpec {
  private val maxExponent = 1.45
  /** Per-head overrides where a steeper slope IS the designed behavior
    * at this particular SF pair. e8_contamination's candidate join is
    * bounded by the df ≤ 100 per-shingle cap — asymptotically linear —
    * and between sf0.01 and sf0.1 pair fanout CAN grow faster than
    * rows while typical shingle document-frequency is still below the
    * cap. The 1.7 allowance that once absorbed a single throttled 1.29
    * reading proved slack: the head has since measured 0.51 (r11) and
    * 0.52 (r12) on clean legs, so a real super-linear regression could
    * have hidden under it (round-12 verdict item 2). 1.0 still leaves
    * ~2× headroom over the measured slope while keeping uncapped
    * all-pairs (~1.9-2.0) far outside. */
  private val boundOverrides = Map("e8_contamination" -> 1.0)
  /** Families whose scale story is load-bearing (bucketed/blocked). */
  private val bucketed = Set(
    "e1_dedup_exact", "e2_minhash_neardup", "e2_simhash_neardup",
    "e2_cluster_cc", "e3_ann_search", "e3_ivf_search", "e3_ivfpq_search",
    "e4_tfidf", "e8_hash_split", "q1_agg", "j1_inner",
    // the heaviest non-stream queries (r10 verdict item 2): frontier
    // equi-join BFS, degree-oriented triangle closure, df-capped
    // contamination join, length-bucketed edit-distance join, and the
    // fused curation pipeline — linear-by-design, now bounded here
    "g3_bfs", "g2_triangles", "e8_contamination", "e2_edit_join",
    "e7_curation",
    // round-11: the line-dedup family head (digest-keyed keep-first)
    // and RAKE (one posexplode + doc-keyed joins — linear by design)
    "e2_line_dedup", "e4_rake_keywords",
    // prefix-filtered containment join (asymmetric AllPairs)
    "e2_containment",
    // round-12: exact maximal-span discovery — anchor-digest pairing
    // whose fanout is true-duplicate mass, diagonal gaps-and-islands
    "e2_substring_exact",
    // round-13: JPEG decode→pHash→banded join (map-only per image,
    // absolute pair budget) and the unigram-LM corpus encode
    // (vocabulary-sized segmentation, occurrence join)
    "e5_jpeg_phash", "e4_unigram_apply",
    // round-14: the WordPiece corpus encode (greedy map-only
    // segmentation of distinct words + occurrence join — linear)
    "e4_wordpiece_apply",
    // round-14: Aho–Corasick dictionary scan (automaton as a plan
    // reference object, map-only + one per-term rollup — linear and
    // dictionary-size independent by construction)
    "e9_dict_scan")

  test(s"measured sf0.01→sf0.1 exponent stays ≤ $maxExponent for every " +
      "bucketed family head in the committed bench artifact") {
    val path = Paths.get("bench_out.json")
    assume(Files.exists(path), "no bench_out.json — run graft.Bench first")
    val root = new ObjectMapper().readTree(Files.readString(path))
    val scaling = root.get("scaling")
    assume(scaling != null && scaling.fieldNames().asScala.nonEmpty,
      "artifact has no scaling map — produced by a pre-slope Bench " +
        "or a run without the sibling sf0.01 dir")
    val present = scaling.fieldNames().asScala.toSet
    // Every load-bearing family must actually have been measured —
    // a renamed head or a failed scaling run (Bench drops failures
    // rather than record a time-to-failure) must fail here, not
    // silently shrink the guard to an empty set.
    val missing = bucketed -- present
    assert(missing.isEmpty,
      s"bucketed families absent from the artifact's scaling map: " +
        missing.toSeq.sorted.mkString(", "))
    val over = present.toSeq.filter(bucketed)
      .map(n => (n, scaling.get(n).get("exponent").asDouble(),
        boundOverrides.getOrElse(n, maxExponent)))
      .filter { case (_, e, bound) => e > bound }
    assert(over.isEmpty,
      s"super-linear sf-slope for bucketed families: " +
        over.map { case (n, e, b) => f"$n (e=$e%.2f > $b%.2f)" }
          .mkString(", "))
  }

  test("the artifact self-adjudicates run-wide VM starvation: " +
      "canary_inflation and the widened retimed map are present") {
    // Round-12 verdict item 1: for four rounds a judge classified
    // total-seconds swings by hand from the canary series. The
    // artifact must now carry (a) `canary_inflation` — median in-run
    // q1_agg canary over the run's own isolated q1_agg scaling point —
    // and (b) a `retimed` map covering EVERY scaling head whose in-run
    // reading exceeded 2× its isolated t_large (not just the 10
    // slowest queries' 3× phase trigger).
    val path = Paths.get("bench_out.json")
    assume(Files.exists(path), "no bench_out.json — run graft.Bench first")
    val root = new ObjectMapper().readTree(Files.readString(path))
    assume(root.get("scaling") != null &&
      root.get("scaling").fieldNames().asScala.nonEmpty,
      "artifact has no scaling map — run with the sibling sf0.01 dir")
    val infl = root.get("canary_inflation")
    assert(infl != null && infl.isNumber,
      "artifact lacks a numeric canary_inflation — a judge would have " +
        "to adjudicate run-wide starvation by hand again")
    assert(infl.asDouble() > 0.0, s"nonsensical inflation $infl")
    val retimed = root.get("retimed")
    assert(retimed != null && retimed.isObject,
      "artifact lacks the retimed map")
    // Consistency: every retimed entry's pair must actually exceed the
    // weaker (2×) trigger — a vacuous entry means the emit logic broke.
    retimed.fieldNames().asScala.foreach { n =>
      val e = retimed.get(n)
      // the artifact stores %.3f-rounded values while Bench triggered
      // on the unrounded pair — a borderline entry may round onto the
      // boundary, so allow one rounding ulp on each side
      assert(e.get("in_run").asDouble() >
        2.0 * e.get("isolated").asDouble() - 0.003,
        s"retimed entry $n does not exceed its own trigger")
    }
  }
}
