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
}
