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
