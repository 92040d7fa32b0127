package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] over STRING
  * keys — the map-side ingest prefilter (see
  * `graft.ext.Dedup.bloomIngestFilter`). The filter rides the plan as
  * a REFERENCE OBJECT (broadcast with the task binary), so the probe
  * is one hash per row with no join and no shuffle. NO FALSE
  * NEGATIVES: a key that was put is always reported present — which is
  * what makes "bloom says new → admit directly" exact. False positives
  * (rate = the filter's fpp) only send extra rows to the exact check
  * downstream, never corrupt results.
  *
  * The key is probed via `mightContainString`, matching how
  * `DataFrameStatFunctions.bloomFilter` / `putString` hash string
  * keys (UTF-8 bytes). */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainString(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContainString($v.toString())")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def bloomMightContain(key: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bloom))
}

/** Membership probe where the FILTER is per-row data: `child` is a
  * BINARY column holding a serialized [[BloomFilter]] (the output of
  * [[BloomBuildAgg]]), and `key` is the constant long being looked
  * up. This is the map-side half of the skipping-index consult (k22):
  * the file-level bloom index is filtered DISTRIBUTEDLY — each task
  * deserializes only the blooms in its own partition and emits a
  * boolean — so the driver collects matching file NAMES, never
  * `files × bloom_bytes`. At 100 TB (~10⁵ files × ~100 KB blooms)
  * that is the difference between ~10 GB through the driver per point
  * lookup and a few KB of paths. Same no-false-negative contract as
  * [[BloomMightContain]]. */
case class BloomBytesMightContain(child: Expression, key: Long)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_bytes_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      .mightContainLong(key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"""org.apache.spark.util.sketch.BloomFilter.readFrom(
         |  new java.io.ByteArrayInputStream($v)).mightContainLong(${key}L)
         |""".stripMargin.replace("\n", " "))

  override protected def withNewChildInternal(
      newChild: Expression): BloomBytesMightContain =
    copy(child = newChild)
}

object BloomBytesMightContain {
  def probe(bloomBytes: Column, key: Long): Column =
    ColumnBridge.column(
      BloomBytesMightContain(ColumnBridge.expression(bloomBytes), key))
}

/** Bloom filter BUILDER as a typed Aggregator over LONG keys — the
  * per-group sketch side of the skipping-index pattern (k22): one
  * distributed aggregation emits a serialized membership sketch per
  * group (per FILE, when grouped on `input_file_name()`), exactly how
  * Parquet/ORC writers and Iceberg/Delta file stats accumulate per-file
  * bloom metadata. Buffers are [[BloomFilter]]s (mergeable —
  * `mergeInPlace` is a bit-OR, so partial aggregation composes across
  * partitions in any order); output is the filter's canonical
  * serialized bytes. Probing a key against the finished index costs
  * one read of a FILE-COUNT-sized table, never a data scan. Bit
  * layout is deterministic for a given insert SET (seeded hashes,
  * OR-composition), so the sketch bytes are stable across partition
  * orderings. */
case class BloomBuildAgg(expectedItems: Long, fpp: Double)
    extends org.apache.spark.sql.expressions.Aggregator[
      Long, BloomFilter, Array[Byte]] {
  import org.apache.spark.sql.{Encoder, Encoders}
  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
  override def reduce(b: BloomFilter, k: Long): BloomFilter = {
    b.putLong(k); b
  }
  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }
  override def finish(b: BloomFilter): Array[Byte] = {
    val os = new java.io.ByteArrayOutputStream()
    b.writeTo(os)
    os.toByteArray
  }
  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
