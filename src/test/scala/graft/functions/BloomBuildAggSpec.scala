package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Contract of the per-group bloom builder behind k22's skipping
  * index: no false negatives (the exactness guarantee the pruning
  * relies on), merge-order determinism (partial buffers bit-OR, so the
  * serialized sketch must not depend on partitioning), and a sane
  * false-positive rate at the configured fpp. */
class BloomBuildAggSpec extends SparkSpec {
  import spark.implicits._

  private def bloomOf(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  test("every inserted key is reported present (no false negatives)") {
    val agg = udaf(BloomBuildAgg(1000L, 0.01))
    val keys = (0L until 500L).map(_ * 7919L)
    val bytes = keys.toDF("k").agg(agg($"k")).as[Array[Byte]].head()
    val bf = bloomOf(bytes)
    assert(keys.forall(bf.mightContainLong),
      "a put key probed absent — pruning on this sketch would drop data")
  }

  test("the serialized sketch is identical across partitionings") {
    val agg = udaf(BloomBuildAgg(1000L, 0.01))
    val keys = (0L until 500L).map(_ * 104729L)
    def build(parts: Int): Seq[Byte] =
      keys.toDF("k").repartition(parts)
        .agg(agg($"k")).as[Array[Byte]].head().toSeq
    assert(build(1) == build(7) && build(7) == build(32),
      "bloom bytes depend on partitioning — the index would be unstable")
  }

  test("BloomBytesMightContain probes the index map-side — only matching " +
      "group names reach the driver, never bloom bytes") {
    val agg = udaf(BloomBuildAgg(1000L, 0.01))
    // 3 groups; key k lives in group f(k % 3).
    val idx = (0L until 300L).map(k => (s"f${k % 3}", k)).toDF("file", "k")
      .groupBy($"file").agg(agg($"k").as("bloom"))
    val probe = idx
      .filter(BloomBytesMightContain.probe($"bloom", 7L))
      .select($"file")
    // The collected projection carries NO binary column: the k22 consult
    // ships file NAMES through the driver, the sketches stay distributed.
    assert(probe.schema.fields.forall(
      _.dataType != org.apache.spark.sql.types.BinaryType),
      "bloom bytes would reach the driver")
    val hits = probe.as[String].collect().toSet
    assert(hits.contains("f1"),
      "no false negatives: key 7 is in f1's bloom and must survive the probe")
  }

  test("false-positive rate stays near the configured fpp") {
    val agg = udaf(BloomBuildAgg(1000L, 0.01))
    val bytes = (0L until 1000L).map(_ * 3L).toDF("k")
      .agg(agg($"k")).as[Array[Byte]].head()
    val bf = bloomOf(bytes)
    // Probe 10k keys strictly above the insert range (max put = 2997).
    val fp = (3001L until 23001L by 2L).count(bf.mightContainLong)
    assert(fp < 400, s"fp rate ${fp / 10000.0} far above configured 0.01")
  }
}
