package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's microservices CHOREOGRAPHY (SURVEY §3.3,
  * microservices/EndToEndTest.java:184-193) run as real separate services
  * over real topics — each service its own streaming query with its own
  * checkpoint, coupled only through graftlog topics, exactly how the
  * reference's OrderDetailsService / FraudService /
  * ValidationsAggregatorService couple through Kafka topics:
  *
  *   orders ─┬─ details service ──▶ validations ─┐
  *           └─ limit service   ──▶ validations ─┴─ aggregator ──▶ states
  *
  * Asserted: verdicts from independent services interleave on the shared
  * validations topic; the aggregator's update-mode changelog appends to
  * the states topic and latest-per-key yields the final state machine
  * (FAILED on any FAIL, VALIDATED on all passes); a full stop/restart of
  * every service resumes from per-service checkpoints — the new order
  * flows through, history is not reprocessed, and each service's
  * exactly-once sink keeps validations at exactly one verdict per
  * (order, service). */
class ChoreographySpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"choreo-$name")
    d.toFile.deleteOnExit(); d.toString
  }

  test("three services over topics: fan-out verdicts, aggregate, restart resume") {
    import spark.implicits._
    val orders = tmp("orders"); val validations = tmp("validations")
    val states = tmp("states")
    val ck = Map("details" -> tmp("ck-details"), "limit" -> tmp("ck-limit"),
      "agg" -> tmp("ck-agg"))

    def publishOrder(id: String, product: String, qty: Int, price: Double): Unit =
      Seq((id, s"""{"product":"$product","quantity":$qty,"price":$price}"""))
        .toDF("key", "value")
        .write.format("graftlog").option("partitions", "2").mode("append").save(orders)

    // the shared topologies (Choreography) — also what ServiceRunner's
    // separate-process coupling and the Avro wire variant run
    def detailsService() =
      Choreography.startService(spark, "details", orders, validations, states, ck("details"))
    def limitService() =
      Choreography.startService(spark, "limit", orders, validations, states, ck("limit"))
    def aggregatorService() =
      Choreography.startService(spark, "agg", orders, validations, states, ck("agg"))

    def latestStates(): Map[String, String] =
      spark.read.format("graftlog").load(states)
        .select(col("key").cast("string").as("key"),
          col("value").cast("string").as("value"), col("partition"), col("offset"))
        .groupBy("key")
        .agg(max_by(col("value"), struct(col("partition"), col("offset"))).as("state"))
        .as[(String, String)].collect().toMap

    def runRound(): Unit = {
      val d = detailsService(); val l = limitService()
      try { d.processAllAvailable(); l.processAllAvailable() }
      finally { quiesceAndStop(d); quiesceAndStop(l) }
      val a = aggregatorService()
      try a.processAllAvailable() finally quiesceAndStop(a)
    }

    publishOrder("o1", "beer", 10, 5.0)     // clean: both PASS
    publishOrder("o2", "vodka", 20, 150.0)  // 3000 >= 2000: LIMIT FAIL
    runRound()
    assert(latestStates() === Map("o1" -> "VALIDATED", "o2" -> "FAILED"))

    // full choreography restart: new order flows through per-service
    // checkpoints; settled orders are not reprocessed
    publishOrder("o3", "whisky", 2, 100.0)
    runRound()
    assert(latestStates() === Map(
      "o1" -> "VALIDATED", "o2" -> "FAILED", "o3" -> "VALIDATED"))

    // exactly-once across the restart: one verdict per (order, service)
    val verdictCounts = spark.read.format("graftlog").load(validations)
      .select(col("key").cast("string").as("key"),
        get_json_object(col("value").cast("string"), "$.check").as("check"))
      .groupBy("key", "check").count().as[(String, String, Long)].collect()
    assert(verdictCounts.length === 6) // 3 orders x 2 services
    assert(verdictCounts.forall(_._3 === 1L),
      s"duplicate verdicts: ${verdictCounts.filter(_._3 > 1).mkString(",")}")
  }

  test("typed wire choreography: every topic carries registry-framed Avro; " +
      "the states topic round-trips byte-exact") {
    import spark.implicits._
    import graft.functions.AvroCodec
    val orders = tmp("avro-orders"); val validations = tmp("avro-validations")
    val states = tmp("avro-states")
    val ck = Map("details" -> tmp("avro-ck-d"), "limit" -> tmp("avro-ck-l"),
      "agg" -> tmp("avro-ck-a"))

    // producer side: typed orders → registry-framed Avro bytes on the log
    // (the Schemas.java discipline — binary key, framed binary value)
    def publishOrder(id: String, product: String, qty: Int, price: Double): Unit =
      AvroCodec.encodeWire(
        Seq((id, product, qty, price)).toDF("key", "product", "quantity", "price"),
        Choreography.OrderSchemaId, Choreography.orderAvroJson, keep = Seq("key"))
        .select(col("key").cast("binary").as("key"), col("avro_bytes").as("value"))
        .write.format("graftlog").option("partitions", "2").mode("append").save(orders)

    publishOrder("o1", "beer", 10, 5.0)    // both PASS
    publishOrder("o2", "vodka", 20, 150.0) // LIMIT FAIL
    publishOrder("o3", "", 2, 100.0)       // empty product: DETAILS FAIL

    for (role <- Seq("details", "limit")) {
      val q = Choreography.startServiceWire(spark, role, orders, validations,
        states, ck(role))
      try q.processAllAvailable() finally quiesceAndStop(q)
    }
    val agg = Choreography.startServiceWire(spark, "agg", orders, validations,
      states, ck("agg"))
    try agg.processAllAvailable() finally quiesceAndStop(agg)

    // every value on every topic is registry-framed: magic 0x00 + id
    def frames(topic: String, id: Int): Unit = {
      val vals = spark.read.format("graftlog").load(topic)
        .select("value").as[Array[Byte]].collect()
      assert(vals.nonEmpty)
      vals.foreach { b =>
        assert(b(0) === 0x00.toByte)
        assert(((b(1) & 0xFF) << 24 | (b(2) & 0xFF) << 16 |
          (b(3) & 0xFF) << 8 | (b(4) & 0xFF)) === id)
      }
    }
    frames(orders, Choreography.OrderSchemaId)
    frames(validations, Choreography.VerdictSchemaId)
    frames(states, Choreography.StateSchemaId)

    // final states decode to the JSON variant's exact state machine
    val raw = spark.read.format("graftlog").load(states)
      .select(col("key"), col("value"), col("partition"), col("offset"))
    val latestRaw = raw
      .groupBy(col("key"))
      .agg(max_by(col("value"), struct(col("partition"), col("offset"))).as("value"))
    val decoded = AvroCodec.decodeWire(latestRaw, Choreography.wireRegistry,
      Choreography.stateAvroJson, bytesCol = "value", keep = Seq("key"))
    val got = decoded.select(col("key").cast("string"), col("state"))
      .as[(String, String)].collect().toMap
    assert(got === Map("o1" -> "VALIDATED", "o2" -> "FAILED", "o3" -> "FAILED"))

    // byte-exact round trip: re-encoding the decoded states under the
    // same schema id reproduces the on-log bytes bit-for-bit
    val reenc = AvroCodec.encodeWire(decoded, Choreography.StateSchemaId,
      Choreography.stateAvroJson, keep = Seq("key"))
      .select(col("key").cast("string").as("key"), col("avro_bytes"))
      .as[(String, Array[Byte])].collect().toMap
    val original = latestRaw
      .select(col("key").cast("string").as("key"), col("value"))
      .as[(String, Array[Byte])].collect().toMap
    assert(reenc.keySet === original.keySet)
    reenc.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, original(k)),
        s"state bytes for $k did not round-trip byte-exact")
    }
  }
}
