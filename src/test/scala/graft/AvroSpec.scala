package graft

import graft.functions.AvroCodec
import org.apache.spark.sql.functions._

/** Avro codec goldens: byte-exact encoding (hand-computed against the
  * Avro binary spec) and lossless round-trip — the serde path of
  * JsonToAvroExample.java:113-126 / Schemas.java:77-83. */
class AvroSpec extends SparkSpec {

  test("avro encode produces spec-exact bytes for a known record") {
    import spark.implicits._
    val df = Seq((1L, "click", 2.5)).toDF("event_id", "event_type", "value")
    val bytes = AvroCodec.encode(df, AvroCodec.eventSchemaJson)
      .head().getAs[Array[Byte]]("avro_bytes")
    // Avro binary spec: long 1 -> zigzag 2 -> varint 0x02; string "click"
    // -> length varint 0x0A + utf8; double 2.5 -> 8 IEEE-754 bytes LE.
    val expected = Array[Byte](0x02, 0x0A, 'c', 'l', 'i', 'c', 'k',
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x04, 0x40)
    assert(bytes.toSeq === expected.toSeq)
  }

  test("avro round-trip is lossless incl. negative ids and empty strings") {
    import spark.implicits._
    val in = Seq(
      (1L, "click", 2.5), (-7L, "", -0.0), (Long.MaxValue, "päge_view", 1e-300))
      .toDF("event_id", "event_type", "value")
    val back = AvroCodec.decode(
        AvroCodec.encode(in, AvroCodec.eventSchemaJson), AvroCodec.eventSchemaJson)
      .as[(Long, String, Double)].collect().toSet
    val orig = in.as[(Long, String, Double)].collect().toSet
    assert(back === orig)
    // -0.0 must survive as -0.0 (bit-level, not numeric, equality)
    val z = back.find(_._1 == -7L).get._3
    assert(java.lang.Double.doubleToRawLongBits(z) ===
      java.lang.Double.doubleToRawLongBits(-0.0))
  }

  // Reader-vs-writer schema resolution — the Schema-Registry compatibility
  // behavior of the reference's serdes (SessionWindowsExample.java:158-160).
  val evolvedSchemaJson: String =
    """{"type":"record","name":"Event","namespace":"graft.avro","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"},
      |{"name":"source","type":"string","default":"unknown"},
      |{"name":"flags","type":["null","string"],"default":null}]}""".stripMargin

  test("schema evolution: new reader fills added fields from defaults") {
    import spark.implicits._
    // Bytes written with the OLD 3-field schema, read with the NEW 5-field
    // reader: added fields come back as their declared defaults.
    val in = Seq((1L, "click", 2.5), (-7L, "view", 0.25))
      .toDF("event_id", "event_type", "value")
    val out = AvroCodec.decode(
        AvroCodec.encode(in, AvroCodec.eventSchemaJson),
        AvroCodec.eventSchemaJson, readerSchemaJson = evolvedSchemaJson)
      .as[(Long, String, Double, String, Option[String])].collect().toSet
    assert(out === Set((1L, "click", 2.5, "unknown", None),
      (-7L, "view", 0.25, "unknown", None)))
  }

  test("schema evolution: old reader skips fields the writer added") {
    import spark.implicits._
    // Bytes written with the NEW 5-field schema, read with the OLD 3-field
    // reader: the extra fields are skipped in the byte stream; surviving
    // values are byte-exact.
    val in = Seq((1L, "click", 2.5, "mobile", Some("x")),
        (Long.MaxValue, "päge_view", 1e-300, "web", None))
      .toDF("event_id", "event_type", "value", "source", "flags")
    val out = AvroCodec.decode(
        AvroCodec.encode(in, evolvedSchemaJson),
        evolvedSchemaJson, readerSchemaJson = AvroCodec.eventSchemaJson)
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set((1L, "click", 2.5), (Long.MaxValue, "päge_view", 1e-300)))
  }

  test("lenient decode drops corrupt records, keeps the rest (HandlingCorruptedInputRecords)") {
    import spark.implicits._
    // reference: HandlingCorruptedInputRecordsIntegrationTest.java:79-98 —
    // a try/catch around the Avro serde skips poison pills.
    val in = Seq((1L, "click", 2.5), (2L, "view", 1.0), (3L, "buy", 9.9))
      .toDF("event_id", "event_type", "value")
    val enc = AvroCodec.encode(in, AvroCodec.eventSchemaJson)
    // corrupt record 2: truncate its payload mid-string
    val schema = enc.schema
    val poisoned = spark.createDataFrame(
      enc.rdd.map { r =>
        val b = r.getAs[Array[Byte]](0)
        if (b(0) == 0x04) org.apache.spark.sql.Row(b.take(2)) else r
      }, schema)
    val strictFails = intercept[org.apache.spark.SparkException] {
      AvroCodec.decode(poisoned, AvroCodec.eventSchemaJson).collect()
    }
    assert(strictFails.getMessage != null)
    val out = AvroCodec.decodeLenient(poisoned, AvroCodec.eventSchemaJson)
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set((1L, "click", 2.5), (3L, "buy", 9.9)))
  }

  test("wire format: magic 0x00 + big-endian schema id precede the spec-exact payload") {
    import spark.implicits._
    val df = Seq((1L, "click", 2.5)).toDF("event_id", "event_type", "value")
    val bytes = AvroCodec.encodeWire(df, 0x01020304, AvroCodec.eventSchemaJson)
      .head().getAs[Array[Byte]]("avro_bytes")
    assert(bytes(0) === AvroCodec.WireMagic)
    assert(bytes.slice(1, 5).toSeq === Seq[Byte](0x01, 0x02, 0x03, 0x04))
    // payload after the 5-byte header = the unframed spec-exact encoding
    val expected = Array[Byte](0x02, 0x0A, 'c', 'l', 'i', 'c', 'k',
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x04, 0x40)
    assert(bytes.drop(5).toSeq === expected.toSeq)
  }

  test("wire format: mixed writer versions in one column resolve per record") {
    import spark.implicits._
    val v1 = AvroCodec.eventSchemaJson
    val v2 =
      """{"type":"record","name":"Event","namespace":"graft.avro","fields":[
        |{"name":"event_id","type":"long"},
        |{"name":"event_type","type":"string"},
        |{"name":"value","type":"double"},
        |{"name":"src","type":"string"}]}""".stripMargin
    val a = AvroCodec.encodeWire(
      Seq((1L, "click", 2.5)).toDF("event_id", "event_type", "value"), 7, v1)
    val b = AvroCodec.encodeWire(
      Seq((2L, "view", 1.5, "mobile")).toDF("event_id", "event_type", "value", "src"), 8, v2)
    // v1 reader: v2's extra field is skipped by Avro schema resolution
    val got = AvroCodec.decodeWire(a.unionByName(b), Map(7 -> v1, 8 -> v2), v1)
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "click", 2.5), (2L, "view", 1.5)))
    // v2-with-default reader: v1-written records fill src from the default
    val v2def = v2.replace("""{"name":"src","type":"string"}""",
      """{"name":"src","type":"string","default":"unknown"}""")
    val got2 = AvroCodec.decodeWire(a.unionByName(b), Map(7 -> v1, 8 -> v2), v2def)
      .as[(Long, String, Double, String)].collect().toSet
    assert(got2 === Set((1L, "click", 2.5, "unknown"), (2L, "view", 1.5, "mobile")))
  }

  test("wire format: bad magic and unknown schema id fail strict, drop lenient") {
    import spark.implicits._
    val v1 = AvroCodec.eventSchemaJson
    val good = AvroCodec.encodeWire(
      Seq((1L, "click", 2.5)).toDF("event_id", "event_type", "value"), 7, v1)
    val unknownId = AvroCodec.encodeWire(
      Seq((2L, "view", 1.5)).toDF("event_id", "event_type", "value"), 99, v1)
    val badMagic = good.select(
      concat(lit(Array[Byte](1)), expr("substring(avro_bytes, 2)")).as("avro_bytes"))
    val mixed = good.unionByName(unknownId).unionByName(badMagic)
    // strict: any bad record fails the decode
    intercept[org.apache.spark.SparkException] {
      AvroCodec.decodeWire(mixed, Map(7 -> v1), v1).count()
    }
    // lenient: only the good record survives
    val got = AvroCodec.decodeWire(mixed, Map(7 -> v1), v1, lenient = true)
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "click", 2.5)))
  }

  test("o18 aggregate over decoded columns matches the raw-column aggregate") {
    val raw = Tables.events(spark, sf001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val dec = ops.Stateless.avroRoundtrip(spark, sf001)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(dec === raw)
  }
}
