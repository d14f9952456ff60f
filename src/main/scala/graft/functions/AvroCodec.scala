package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._
import java.io.ByteArrayOutputStream

/** Avro binary encode/decode over DataFrame columns — the reference's
  * dominant wire format (Schemas.java:77-83 registers Avro serdes for
  * every microservices topic; JsonToAvroExample.java:113-126 converts a
  * JSON stream to Avro records).
  *
  * Spark-first shape: the environment ships Apache Avro core but no
  * spark-avro connector, so the codec runs as `mapPartitions` — one
  * parsed Schema, one reusable DatumWriter/DatumReader and one reusable
  * binary en/decoder per PARTITION (the per-batch amortization the
  * reference gets from its Serde instances), never per row, and the
  * plumbing stays a narrow transformation: no shuffle, encode/decode
  * happens wherever the rows already are. With the connector present the
  * same call sites would be `from_avro`/`to_avro` columns.
  *
  * Supported field types: long, int, double, float, boolean, string,
  * bytes — the types the reference's schemas use (order.avsc etc.).
  * Avro binary encoding is deterministic for a given record, so encoded
  * bytes are stable across engines and runs.
  */
object AvroCodec {

  /** Demo schema over the events table, mirroring the shape of the
    * reference's avro/microservices/order.avsc (id + enum-ish string +
    * numeric). */
  val eventSchemaJson: String =
    """{"type":"record","name":"Event","namespace":"graft.avro","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"}]}""".stripMargin

  /** Encode the schema's fields of every row into one Avro binary column;
    * `keep` columns pass through unchanged. */
  def encode(df: DataFrame, schemaJson: String, keep: Seq[String] = Seq.empty,
      outCol: String = "avro_bytes"): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(
      keep.map(k => inSchema(k)) :+ StructField(outCol, BinaryType, nullable = false))
    val keepIdx = keep.map(inSchema.fieldIndex)
    df.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fieldIdx = schema.getFields.toArray.map { f =>
        inSchema.fieldIndex(f.asInstanceOf[Schema.Field].name)
      }
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val out = new ByteArrayOutputStream()
      var enc = EncoderFactory.get().binaryEncoder(out, null)
      it.map { row =>
        out.reset()
        enc = EncoderFactory.get().binaryEncoder(out, enc)
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldIdx.length) {
          rec.put(i, row.get(fieldIdx(i)))
          i += 1
        }
        writer.write(rec, enc)
        enc.flush()
        Row.fromSeq(keepIdx.map(row.get) :+ out.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode an Avro binary column back into typed columns (reader-schema
    * field order); `keep` columns pass through.
    *
    * When `readerSchemaJson` is given and differs from the writer schema,
    * standard Avro schema resolution applies — the behavior the
    * reference's Schema-Registry-backed serdes provide
    * (SessionWindowsExample.java:158-160: the registry resolves the
    * writer's schema against the consumer's compiled reader schema):
    * fields the reader adds are filled from their declared defaults,
    * fields the reader drops are skipped over in the byte stream, and
    * matching is by field NAME, not position. The output columns follow
    * the READER schema. */
  def decode(df: DataFrame, schemaJson: String, bytesCol: String = "avro_bytes",
      keep: Seq[String] = Seq.empty, readerSchemaJson: String = null): DataFrame =
    decodeImpl(df, schemaJson, bytesCol, keep, readerSchemaJson, lenient = false)

  /** [[decode]] that SKIPS undecodable records instead of failing the
    * task — the reference's poison-pill handling, which is specifically
    * about Avro deserialization failures
    * (HandlingCorruptedInputRecordsIntegrationTest.java:79-98: flatMap
    * with a try/catch around the serde, corrupt records dropped). */
  def decodeLenient(df: DataFrame, schemaJson: String, bytesCol: String = "avro_bytes",
      keep: Seq[String] = Seq.empty, readerSchemaJson: String = null): DataFrame =
    decodeImpl(df, schemaJson, bytesCol, keep, readerSchemaJson, lenient = true)

  private def decodeImpl(df: DataFrame, schemaJson: String, bytesCol: String,
      keep: Seq[String], readerSchemaJson: String, lenient: Boolean): DataFrame = {
    val readerJson = if (readerSchemaJson == null) schemaJson else readerSchemaJson
    val inSchema = df.schema
    val reader0 = new Schema.Parser().parse(readerJson)
    val decodedFields = reader0.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[Schema.Field]
      StructField(f.name, sparkType(f.schema), nullable = isNullable(f.schema))
    }
    val outSchema = StructType(keep.map(k => inSchema(k)) ++ decodedFields)
    val keepIdx = keep.map(inSchema.fieldIndex)
    val bytesIdx = inSchema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      // One writer→reader-resolved DatumReader per partition: resolution
      // (the field-matching "symbol table") is computed once, not per row.
      val writerSchema = new Schema.Parser().parse(schemaJson)
      val readerSchema = new Schema.Parser().parse(readerJson)
      val reader = new GenericDatumReader[GenericRecord](writerSchema, readerSchema)
      var dec = DecoderFactory.get().binaryDecoder(Array.empty[Byte], null)
      val n = readerSchema.getFields.size()
      it.flatMap { row =>
        try {
          dec = DecoderFactory.get().binaryDecoder(row.getAs[Array[Byte]](bytesIdx), dec)
          // no record reuse: a partially-read record from a corrupt row
          // must not leak stale fields into the next one
          val rec: GenericRecord = reader.read(null, dec)
          val vals = (0 until n).map(i => fromAvro(rec.get(i)))
          Some(Row.fromSeq(keepIdx.map(row.get) ++ vals))
        } catch {
          case _: Exception if lenient => None
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- Confluent Schema-Registry wire format ------------------------

  /** The registry wire format (public Confluent format, used by every
    * registry-backed serde the reference configures —
    * SessionWindowsExample.java:158-160, Schemas.java:77-83): one magic
    * byte 0x00, the writer's schema id as a BIG-ENDIAN 4-byte int, then
    * the Avro binary payload. The registry's HTTP client cannot exist in
    * this offline environment (README "Kafka connectivity"); what CAN —
    * and what correctness actually depends on — is this framing plus
    * id-based writer-schema resolution, with the id→schema mapping
    * supplied locally exactly as the registry's `/schemas/ids/{id}`
    * endpoint would supply it. On a live cluster the same call sites
    * swap the map for the client's fetch. */
  val WireMagic: Byte = 0x00

  /** [[encode]] with the registry framing: every payload is prefixed
    * with magic + `schemaId`. */
  def encodeWire(df: DataFrame, schemaId: Int, schemaJson: String,
      keep: Seq[String] = Seq.empty, outCol: String = "avro_bytes"): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(
      keep.map(k => inSchema(k)) :+ StructField(outCol, BinaryType, nullable = false))
    val keepIdx = keep.map(inSchema.fieldIndex)
    df.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fieldIdx = schema.getFields.toArray.map { f =>
        inSchema.fieldIndex(f.asInstanceOf[Schema.Field].name)
      }
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val out = new ByteArrayOutputStream()
      var enc = EncoderFactory.get().binaryEncoder(out, null)
      it.map { row =>
        out.reset()
        // header first: the encoder buffers and only hits `out` at flush
        out.write(WireMagic)
        out.write((schemaId >>> 24) & 0xFF); out.write((schemaId >>> 16) & 0xFF)
        out.write((schemaId >>> 8) & 0xFF); out.write(schemaId & 0xFF)
        enc = EncoderFactory.get().binaryEncoder(out, enc)
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldIdx.length) {
          rec.put(i, row.get(fieldIdx(i)))
          i += 1
        }
        writer.write(rec, enc)
        enc.flush()
        Row.fromSeq(keepIdx.map(row.get) :+ out.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode registry-framed records, resolving each record's WRITER
    * schema from its framed id via the local `registry` map and
    * schema-resolving it against `readerSchemaJson` — so ONE byte column
    * may carry records written under different schema versions (the
    * actual point of the registry: producers upgrade independently and
    * every consumer resolves per record). Per partition, one resolved
    * DatumReader is cached per distinct writer id. Output columns follow
    * the reader schema. `lenient=true` drops bad-magic / unknown-id /
    * undecodable records (poison-pill handling); otherwise they fail. */
  def decodeWire(df: DataFrame, registry: Map[Int, String],
      readerSchemaJson: String, bytesCol: String = "avro_bytes",
      keep: Seq[String] = Seq.empty, lenient: Boolean = false): DataFrame =
    decodeWireImpl(df,
      id => registry.getOrElse(id,
        throw new IllegalArgumentException(s"schema id $id not in registry")),
      readerSchemaJson, bytesCol, keep, lenient)

  /** [[decodeWire]] against a LIVE Schema Registry: each executor JVM
    * resolves an unseen framed id with one `GET /schemas/ids/{id}` and
    * caches it forever ([[SchemaRegistryClient.getById]]) — the
    * consumer-side behavior of the reference's registry-backed serdes
    * (SessionWindowsExample.java:158-160). Unknown ids and HTTP failures
    * follow the same strict/lenient semantics as the map form. */
  def decodeWireRegistry(df: DataFrame, registryUrl: String,
      readerSchemaJson: String, bytesCol: String = "avro_bytes",
      keep: Seq[String] = Seq.empty, lenient: Boolean = false): DataFrame =
    decodeWireImpl(df, id => SchemaRegistryClient.getById(registryUrl, id),
      readerSchemaJson, bytesCol, keep, lenient)

  /** Producer-side registry flow: register `schemaJson` under `subject`
    * (driver-side, once — identical content re-registers to the same id)
    * and frame every payload with the returned id, exactly what the
    * reference's registry-backed serializer does on first produce. */
  def encodeWireRegistered(df: DataFrame, registryUrl: String,
      subject: String, schemaJson: String, keep: Seq[String] = Seq.empty,
      outCol: String = "avro_bytes"): DataFrame = {
    val id = SchemaRegistryClient.register(registryUrl, subject, schemaJson)
    encodeWire(df, id, schemaJson, keep, outCol)
  }

  private def decodeWireImpl(df: DataFrame, resolve: Int => String,
      readerSchemaJson: String, bytesCol: String,
      keep: Seq[String], lenient: Boolean): DataFrame = {
    val inSchema = df.schema
    val reader0 = new Schema.Parser().parse(readerSchemaJson)
    val decodedFields = reader0.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[Schema.Field]
      StructField(f.name, sparkType(f.schema), nullable = isNullable(f.schema))
    }
    val outSchema = StructType(keep.map(k => inSchema(k)) ++ decodedFields)
    val keepIdx = keep.map(inSchema.fieldIndex)
    val bytesIdx = inSchema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      val readerSchema = new Schema.Parser().parse(readerSchemaJson)
      val readers = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      var dec = DecoderFactory.get().binaryDecoder(Array.empty[Byte], null)
      val n = readerSchema.getFields.size()
      it.flatMap { row =>
        try {
          val bytes = row.getAs[Array[Byte]](bytesIdx)
          if (bytes.length < 5 || bytes(0) != WireMagic)
            throw new IllegalArgumentException(
              s"not registry-framed (len=${bytes.length})")
          val id = ((bytes(1) & 0xFF) << 24) | ((bytes(2) & 0xFF) << 16) |
            ((bytes(3) & 0xFF) << 8) | (bytes(4) & 0xFF)
          val reader = readers.getOrElseUpdate(id,
            new GenericDatumReader[GenericRecord](
              new Schema.Parser().parse(resolve(id)), readerSchema))
          dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, dec)
          val rec: GenericRecord = reader.read(null, dec)
          val vals = (0 until n).map(i => fromAvro(rec.get(i)))
          Some(Row.fromSeq(keepIdx.map(row.get) ++ vals))
        } catch {
          case _: Exception if lenient => None
        }
      }
    }(Encoders.row(outSchema))
  }

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG    => LongType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.UNION   =>
      // the idiomatic Avro nullable: a 2-branch union with "null"
      val branches = nonNullBranches(s)
      if (branches.size == 1) sparkType(branches.head)
      else throw new IllegalArgumentException(s"unsupported avro union ${s}")
    case t => throw new IllegalArgumentException(s"unsupported avro type $t")
  }

  private def nonNullBranches(s: Schema) = {
    val it = s.getTypes.iterator()
    val b = Seq.newBuilder[Schema]
    while (it.hasNext) { val t = it.next(); if (t.getType != Schema.Type.NULL) b += t }
    b.result()
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && {
      val it = s.getTypes.iterator()
      var hasNull = false
      while (it.hasNext) if (it.next().getType == Schema.Type.NULL) hasNull = true
      hasNull
    }

  private def fromAvro(v: AnyRef): Any = v match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case x => x
  }
}
