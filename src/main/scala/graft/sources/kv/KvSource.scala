package graft.sources.kv

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-memory stand-in for the remote key-value service the reference
  * federates (DynamoDB behind a Lambda connector,
  * stacks/demo_stack.py:308-323, table at :396-409). The store itself is
  * a process-local registry; everything Spark-facing — segment-parallel
  * scan, key-predicate pushdown, column pruning — is the real connector
  * contract a production KV connector implements.
  */
object KvStore {
  private val stores =
    new ConcurrentHashMap[String, ConcurrentHashMap[java.lang.Long, Map[String, String]]]()

  private def store(name: String) =
    stores.computeIfAbsent(name, _ => new ConcurrentHashMap[java.lang.Long, Map[String, String]]())

  /** Direct item put (the service's write API; test fixtures). */
  def put(name: String, items: Seq[(Long, Map[String, String])]): Unit = {
    val s = store(name)
    items.foreach { case (k, v) => s.put(k, v) }
  }

  /** Distributed bulk load: each partition writes its rows through the
    * service client — no driver-side collect. `df` must have columns
    * (kv_key long, attrs map<string,string>). In local mode the
    * "client" is the shared registry; on a cluster it would be the
    * remote service connection the partition opens. */
  def bulkLoad(name: String, df: DataFrame): Unit = {
    import org.apache.spark.sql.Row
    df.select("kv_key", "attrs").foreachPartition { it: Iterator[Row] =>
      val s = store(name)
      it.foreach { r =>
        s.put(r.getLong(0), r.getMap[String, String](1).toMap)
      }
    }
  }

  /** One segment of a parallel scan, fetched by the READER (executor
    * side) — the driver never materializes items; it plans segment
    * descriptors only. Keys hash across segments by floorMod; an
    * optional pushed key set restricts the fetch to point lookups. */
  def segment(name: String, seg: Int, nSegments: Int,
      keys: Option[Set[Long]]): IndexedSeq[(Long, Map[String, String])] =
    store(name).asScala.toIndexedSeq
      .map { case (k, v) => (k.longValue(), v) }
      .filter { case (k, _) =>
        java.lang.Math.floorMod(k, nSegments.toLong) == seg &&
          keys.forall(_.contains(k))
      }
      .sortBy(_._1)

  /** Drop every item in a store (the service's truncate API). */
  def clear(name: String): Unit = store(name).clear()
}

/** DataSource V2 provider: `spark.read.format(classOf[KvSource].getName)
  * .option("store", name).load()` — a `TableProvider` whose scans push
  * key-equality predicates down to point lookups and prune columns at
  * the source (SURVEY §2.1 S8: "external TableProvider (DSv2)"). */
class KvSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val store = properties.get("store")
    require(store != null && store.nonEmpty,
      "the graft KV source requires .option(\"store\", <name>)")
    new KvTable(store,
      Option(properties.get("segments")).map(_.toInt).getOrElse(4))
  }
}

object KvSource {
  val Schema: StructType = StructType(Seq(
    StructField("kv_key", LongType, nullable = false),
    StructField("attrs", MapType(StringType, StringType), nullable = true)))
}

private[kv] class KvTable(storeName: String, segments: Int)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"kv:$storeName"
  override def schema(): StructType = KvSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(storeName, segments)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(storeName, info.schema())
}

/** DSv2 write path (`df.write.format(...).option("store", n)
  * .mode("append"|"overwrite").save()`): each task writes its own rows
  * through the service client — puts are key-idempotent, so task
  * retries are safe without a commit protocol and nothing funnels
  * through the driver. `overwrite` maps to `SupportsTruncate`: the
  * store is cleared once at job start (driver side, before any task
  * runs), mirroring a real KV sink's truncate-then-load. */
private[kv] class KvWriteBuilder(storeName: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    require(schema.fieldNames.contains("kv_key") &&
      schema.fieldNames.contains("attrs"),
      s"the graft KV sink needs (kv_key long, attrs map<string,string>); got ${schema.simpleString}")
    new Write {
      override def toBatch: BatchWrite = new KvBatchWrite(storeName, schema, doTruncate)
    }
  }
}

private[kv] class KvBatchWrite(storeName: String, schema: StructType,
    doTruncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    if (doTruncate) KvStore.clear(storeName) // once, before tasks launch
    new KvWriterFactory(storeName, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[kv] class KvWriterFactory(storeName: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val keyIdx = schema.fieldIndex("kv_key")
    val attrsIdx = schema.fieldIndex("attrs")
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        val m = row.getMap(attrsIdx)
        val ks = m.keyArray()
        val vs = m.valueArray()
        val attrs = (0 until m.numElements()).map { i =>
          ks.getUTF8String(i).toString ->
            (if (vs.isNullAt(i)) null else vs.getUTF8String(i).toString)
        }.toMap
        KvStore.put(storeName, Seq(row.getLong(keyIdx) -> attrs))
      }
      override def commit(): WriterCommitMessage = KvCommitDone
      override def abort(): Unit = () // idempotent puts: retry overwrites
      override def close(): Unit = ()
    }
  }
}

private[kv] case object KvCommitDone extends WriterCommitMessage

/** Pushdown happens here: key-equality filters (EqualTo/In on kv_key)
  * are accepted and turn the scan into point lookups — only matching
  * items are planned into partitions; everything else stays a full
  * segment-parallel scan. Column pruning drops unreferenced columns at
  * the reader. */
private[kv] class KvScanBuilder(storeName: String, segments: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushedKeys: Option[Set[Long]] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = KvSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("kv_key", _: Long) => true
      case In("kv_key", vs) => vs.forall(_.isInstanceOf[Long])
      case _ => false
    }
    // Filters are CONJUNCTIVE: each accepted filter's key set constrains
    // the scan, so the pushed set is their INTERSECTION (a union would
    // return rows Spark never re-filters — accepted filters are final).
    val keySets = accepted.map {
      case EqualTo(_, v: Long) => Set(v)
      case In(_, vs) => vs.map(_.asInstanceOf[Long]).toSet
      case _ => Set.empty[Long]
    }
    if (accepted.nonEmpty) pushedKeys = Some(keySets.reduce(_ intersect _))
    pushed = accepted
    rejected // Spark re-evaluates anything the source didn't take
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new KvScan(storeName, segments, pushedKeys, required)
}

private[kv] class KvScan(storeName: String, segments: Int,
    pushedKeys: Option[Set[Long]], required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"kv:$storeName pushedKeys=${pushedKeys.fold("*")(_.toSeq.sorted.mkString("[", ",", "]"))} " +
      s"readSchema=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // The driver plans SEGMENT DESCRIPTORS only (store, segment index,
    // pushed keys) — readers fetch their segment from the service on
    // the executor, so no item payload ever funnels through the driver.
    val n = math.max(1, segments)
    (0 until n).map { seg =>
      KvInputPartition(storeName, seg, n,
        pushedKeys.map(_.toArray.sorted)).asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(required)
}

private[kv] case class KvInputPartition(storeName: String, seg: Int,
    nSegments: Int, pushedKeys: Option[Array[Long]]) extends InputPartition

private[kv] class KvReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvInputPartition]
    val items = KvStore.segment(p.storeName, p.seg, p.nSegments,
      p.pushedKeys.map(_.toSet))
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < items.length }
      override def get(): InternalRow = {
        val (k, attrs) = items(i)
        val values: Array[Any] = fields.map {
          case "kv_key" => k
          case "attrs" =>
            new ArrayBasedMapData(
              new GenericArrayData(attrs.keys.map(UTF8String.fromString).toArray[Any]),
              new GenericArrayData(attrs.values.map(UTF8String.fromString).toArray[Any]))
        }
        new GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
