package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("asofJoin matches latest at-or-before right row per key") {
    val quotes = Seq( // (key, ts, px)
      ("A", ts(1), 10.0), ("A", ts(5), 11.0), ("B", ts(3), 20.0))
      .toDF("sym", "qts", "px")
    val trades = Seq( // (key, ts, id)
      ("A", ts(0), 1L), // before any quote -> null
      ("A", ts(1), 2L), // exactly simultaneous -> matched (>= semantics)
      ("A", ts(4), 3L), // between quotes -> 10.0
      ("A", ts(9), 4L), // after last -> 11.0
      ("B", ts(9), 5L), // other key -> 20.0
      ("C", ts(9), 6L)) // key with no quotes -> null
      .toDF("sym", "tts", "id")
    val out = AsOfJoin.asofJoin(trades, quotes, "sym", "tts", "qts", "px")
      .select("id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(
      1L -> None, 2L -> Some(10.0), 3L -> Some(10.0),
      4L -> Some(11.0), 5L -> Some(20.0), 6L -> None))
  }

  test("asofJoinTolerance nulls stale matches, never promotes older rows") {
    val quotes = Seq(("A", 100L, 10.0), ("A", 500L, 11.0))
      .toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", 120L, 1L), // gap 20 ≤ 50 → 10.0
      ("A", 400L, 2L), // latest preceding is 100, gap 300 > 50 → null
      //   (a tolerance applied BEFORE selection would also yield null
      //    here, but…)
      ("A", 540L, 3L), // latest is 500 (gap 40 → 11.0); the OLDER 100
      //    is out of tolerance — selection must pick latest first
      ("B", 540L, 4L)) // no quotes → null
      .toDF("sym", "tts", "id")
    val out = AsOfJoin.asofJoinTolerance(trades, quotes, "sym", "tts",
        "qts", "px", tolMicros = 50L)
      .select("id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(10.0), 2L -> None,
      3L -> Some(11.0), 4L -> None), out)
  }

  test("rangeJoinBucketed equals the naive range join, boundaries half-open") {
    import org.apache.spark.sql.functions._
    // intervals of length ≤ 10 (bucketW 10): one bucket-aligned, one
    // straddling a bucket edge; points at s (in), e (out), e-1 (in).
    val intervals = Seq((1L, 10L, 20L), (2L, 15L, 25L), (3L, 90L, 95L))
      .toDF("window_id", "s", "e")
    val points = (0L until 100L).map(p => (p, 1.0)).toDF("pt", "v")
    val bucketed = AsOfJoin.rangeJoinBucketed(points, intervals, bucketW = 10L)
      .select($"window_id", $"pt").as[(Long, Long)].collect().toSet
    val naive = points.crossJoin(intervals)
      .filter($"pt" >= $"s" && $"pt" < $"e")
      .select($"window_id", $"pt").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(bucketed.contains((1L, 10L)) && !bucketed.contains((1L, 20L)))
    assert(bucketed.contains((1L, 19L)))
    assert(bucketed.count(_._1 == 2L) == 10)
  }
}
