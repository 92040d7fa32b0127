package graft.lake

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Avro-core behaviors the s26/s27 gates rely on (the
  * spark-avro DS module is absent; these are the raw container
  * mechanics): deflate round-trip fidelity, reader-schema resolution
  * (dropped field + added default), and loud rejection of corrupt
  * containers. */
class AvroContainerSpec extends AnyFunSuite {

  private val writerSchema = new Schema.Parser().parse(
    """{"type":"record","name":"Doc","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"lang","type":"string"},
      |{"name":"text","type":"string"}]}""".stripMargin)

  private def container(rows: Seq[(Long, String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](
      writerSchema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(writerSchema, bos)
    rows.foreach { case (id, lang, txt) =>
      val r = new GenericData.Record(writerSchema)
      r.put("doc_id", id); r.put("lang", lang); r.put("text", txt)
      w.append(r)
    }
    w.close()
    bos.toByteArray
  }

  private def readAll(bytes: Array[Byte],
      reader: GenericDatumReader[GenericRecord]): Seq[GenericRecord] = {
    val st = new DataFileStream(new ByteArrayInputStream(bytes), reader)
    try Iterator.continually(st).takeWhile(_.hasNext)
      .map(_.next()).toList
    finally st.close()
  }

  test("deflate container round-trips values exactly") {
    val rows = Seq((1L, "en", "a b c"), (2L, "fr", ""), (3L, "zh", "x" * 500))
    val back = readAll(container(rows),
      new GenericDatumReader[GenericRecord]())
    assert(back.map(r => (r.get("doc_id").asInstanceOf[Long],
      r.get("lang").toString, r.get("text").toString)) == rows)
  }

  test("reader schema drops text and fills the added default") {
    val readerSchema = new Schema.Parser().parse(
      """{"type":"record","name":"Doc","fields":[
        |{"name":"doc_id","type":"long"},
        |{"name":"src","type":"string","default":"avro"}]}""".stripMargin)
    val back = readAll(container(Seq((7L, "de", "hello"))),
      new GenericDatumReader[GenericRecord](readerSchema))
    assert(back.size == 1)
    assert(back.head.get("doc_id").asInstanceOf[Long] == 7L)
    assert(back.head.get("src").toString == "avro")
    assert(back.head.getSchema.getField("text") == null,
      "dropped field must not resolve")
  }

  test("bad magic is rejected; truncation silently DROPS rows — the " +
      "reason the s26 gate restates full row content") {
    val good = container(Seq((1L, "en", "abc"), (2L, "fr", "def")))
    intercept[java.io.IOException](
      readAll("not avro at all".getBytes("UTF-8"),
        new GenericDatumReader[GenericRecord]()))
    // Avro's DataFileStream treats EOF mid-block as end-of-stream BY
    // DESIGN (hasNext catches EOFException), so a truncated container
    // does NOT throw — it yields fewer rows. Pin that behavior: it is
    // exactly why the s26 oracle is a FULL-row restatement (a dropped
    // block is a hash fail), not a schema/no-crash check.
    val truncated = readAll(good.dropRight(25),
      new GenericDatumReader[GenericRecord]())
    assert(truncated.size < 2,
      s"expected truncation to lose rows, got ${truncated.size}")
  }
}
