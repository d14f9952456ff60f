package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.functions.AvroCodec

/** The microservices choreography's service topologies — ONE definition
  * shared by three couplings:
  *
  *  - ChoreographySpec: each service its own streaming query + checkpoint
  *    in one JVM, coupled only through graftlog topics;
  *  - CrossProcessChoreographySpec: each service its own OS PROCESS
  *    ([[ServiceRunner]]) over a shared topic directory — the reference's
  *    actual deployment model (microservices/EndToEndTest.java:184-193:
  *    OrderDetailsService / FraudService / ValidationsAggregatorService
  *    as separate JVMs coupled only by the broker);
  *  - the typed WIRE variant: every topic carries REGISTRY-FRAMED Avro
  *    (magic byte + schema id + binary payload — the Schemas.java:77-83
  *    serde discipline), decoded per record against the id→schema map a
  *    live registry would serve.
  *
  * Topology (reference microservices/ package):
  * {{{
  *   orders ─┬─ details service ──▶ validations ─┐
  *           └─ limit service   ──▶ validations ─┴─ aggregator ──▶ states
  * }}}
  */
object Choreography {

  val orderSchema: StructType =
    StructType.fromDDL("product STRING, quantity INT, price DOUBLE")

  private def verdictJson(in: DataFrame, check: String, pass: Column): DataFrame =
    in.select(col("key"), from_json(col("value"), orderSchema).as("o"))
      .select(col("key"), concat(lit(s"""{"check":"$check","result":""""),
        when(pass, "PASS").otherwise("FAIL"), lit("\"}")).as("value"))

  /** JSON order (key, value) → JSON DETAILS verdict: non-negative
    * quantity and price, product present (OrderDetailsService's checks). */
  def detailsVerdicts(in: DataFrame): DataFrame =
    verdictJson(in, "DETAILS",
      col("o.quantity") >= 0 && col("o.price") >= 0 && col("o.product").isNotNull)

  /** JSON order → JSON LIMIT verdict: order total under the fraud limit
    * (FraudService's session-total check, simplified to per-order). */
  def limitVerdicts(in: DataFrame): DataFrame =
    verdictJson(in, "LIMIT", col("o.quantity") * col("o.price") < 2000.0)

  /** Verdicts → per-order state machine: FAILED on any FAIL, VALIDATED
    * once both checks PASS, CREATED while pending — an update-mode
    * changelog (ValidationsAggregatorService). Each service emits exactly
    * ONE verdict per (order, check) — the EOS sink guarantees it — so a
    * plain PASS count equals the distinct-check count (streaming
    * aggregates cannot plan countDistinct). */
  def aggregateStates(in: DataFrame): DataFrame =
    in.select(col("key"),
        get_json_object(col("value"), "$.check").as("check"),
        get_json_object(col("value"), "$.result").as("result"))
      .groupBy(col("key"))
      .agg(count(when(col("result") === "FAIL", 1)).as("n_fail"),
        count(when(col("result") === "PASS", 1)).as("n_pass"))
      .select(col("key"),
        when(col("n_fail") > 0, "FAILED")
          .when(col("n_pass") === 2, "VALIDATED")
          .otherwise("CREATED").as("value"))

  /** Start one service by role over the shared topic dirs — the body of
    * the [[ServiceRunner]] process entrypoint and of the in-session
    * specs, so every coupling runs the identical topology. */
  def startService(spark: SparkSession, role: String, orders: String,
      validations: String, states: String, ckpt: String): StreamingQuery = role match {
    case "details" => Sources.writeLog(
      detailsVerdicts(Sources.readLog(spark, orders)), validations, ckpt).start()
    case "limit" => Sources.writeLog(
      limitVerdicts(Sources.readLog(spark, orders)), validations, ckpt).start()
    case "agg" => Sources.writeLog(
      aggregateStates(Sources.readLog(spark, validations)), states, ckpt)
      .outputMode("update").start()
    case other => throw new IllegalArgumentException(s"unknown service role: $other")
  }

  // ---- typed wire variant: registry-framed Avro on every topic --------

  val OrderSchemaId = 11
  val VerdictSchemaId = 12
  val StateSchemaId = 13

  val orderAvroJson: String =
    """{"type":"record","name":"Order","namespace":"graft.avro.micro","fields":[
      |{"name":"product","type":"string"},
      |{"name":"quantity","type":"int"},
      |{"name":"price","type":"double"}]}""".stripMargin

  val verdictAvroJson: String =
    """{"type":"record","name":"OrderValidation","namespace":"graft.avro.micro","fields":[
      |{"name":"check","type":"string"},
      |{"name":"result","type":"string"}]}""".stripMargin

  val stateAvroJson: String =
    """{"type":"record","name":"OrderState","namespace":"graft.avro.micro","fields":[
      |{"name":"state","type":"string"}]}""".stripMargin

  /** The id→schema map a live registry serves from `/schemas/ids/{id}`;
    * on a real cluster [[AvroCodec.decodeWireRegistry]] swaps this for
    * the HTTP client with identical semantics. */
  val wireRegistry: Map[Int, String] = Map(
    OrderSchemaId -> orderAvroJson,
    VerdictSchemaId -> verdictAvroJson,
    StateSchemaId -> stateAvroJson)

  private def verdictWire(in: DataFrame, check: String, pass: Column): DataFrame = {
    val o = AvroCodec.decodeWire(in, wireRegistry, orderAvroJson,
      bytesCol = "value", keep = Seq("key"))
    val v = o.select(col("key"), lit(check).as("check"),
      when(pass, "PASS").otherwise("FAIL").as("result"))
    AvroCodec.encodeWire(v, VerdictSchemaId, verdictAvroJson, keep = Seq("key"))
      .select(col("key"), col("avro_bytes").as("value"))
  }

  /** [[detailsVerdicts]] with registry-framed Avro in AND out: the typed
    * product check becomes non-empty (no union-null in the wire schema —
    * an absent product is the empty string on this wire). */
  def detailsVerdictsWire(in: DataFrame): DataFrame =
    verdictWire(in, "DETAILS",
      col("quantity") >= 0 && col("price") >= 0 && length(col("product")) > 0)

  def limitVerdictsWire(in: DataFrame): DataFrame =
    verdictWire(in, "LIMIT", col("quantity") * col("price") < 2000.0)

  /** [[aggregateStates]] on the Avro wire: decode framed verdicts,
    * aggregate, emit framed OrderState values. */
  def aggregateStatesWire(in: DataFrame): DataFrame = {
    val v = AvroCodec.decodeWire(in, wireRegistry, verdictAvroJson,
      bytesCol = "value", keep = Seq("key"))
    val st = v.groupBy(col("key"))
      .agg(count(when(col("result") === "FAIL", 1)).as("n_fail"),
        count(when(col("result") === "PASS", 1)).as("n_pass"))
      .select(col("key"),
        when(col("n_fail") > 0, "FAILED")
          .when(col("n_pass") === 2, "VALIDATED")
          .otherwise("CREATED").as("state"))
    AvroCodec.encodeWire(st, StateSchemaId, stateAvroJson, keep = Seq("key"))
      .select(col("key"), col("avro_bytes").as("value"))
  }

  /** [[startService]] for the Avro wire coupling: binary in, binary out
    * ([[Sources.readLogBytes]] — no string casts anywhere). */
  def startServiceWire(spark: SparkSession, role: String, orders: String,
      validations: String, states: String, ckpt: String): StreamingQuery = role match {
    case "details" => Sources.writeLog(
      detailsVerdictsWire(Sources.readLogBytes(spark, orders)), validations, ckpt).start()
    case "limit" => Sources.writeLog(
      limitVerdictsWire(Sources.readLogBytes(spark, orders)), validations, ckpt).start()
    case "agg" => Sources.writeLog(
      aggregateStatesWire(Sources.readLogBytes(spark, validations)), states, ckpt)
      .outputMode("update").start()
    case other => throw new IllegalArgumentException(s"unknown service role: $other")
  }
}
