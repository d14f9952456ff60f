package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.functions.{AvroCodec, SchemaRegistryClient}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** In-process stand-in for the Confluent Schema Registry REST API — the
  * three endpoints the serde lifecycle touches, over an in-memory store
  * with content-addressed ids (identical schema → same id, like the real
  * registry). `idFetches` counts `/schemas/ids/{id}` hits so specs can
  * assert the client's forever-cache actually suppresses refetches. */
class StubSchemaRegistry {
  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private val schemasById = scala.collection.mutable.Map.empty[Int, String]
  private val idBySchema = scala.collection.mutable.Map.empty[String, Int]
  private val subjectVersions =
    scala.collection.mutable.Map.empty[String, Vector[Int]]
  val idFetches = new AtomicInteger(0)

  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port"

  def start(): StubSchemaRegistry = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (exchange: HttpExchange) => {
      val (status, body) = synchronized(route(exchange))
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set(
        "Content-Type", "application/vnd.schemaregistry.v1+json")
      exchange.sendResponseHeaders(status, bytes.length)
      val os = exchange.getResponseBody
      os.write(bytes); os.close()
    })
    server.start()
    this
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def route(exchange: HttpExchange): (Int, String) = {
    val method = exchange.getRequestMethod
    val path = exchange.getRequestURI.getPath
    (method, path.split("/").filter(_.nonEmpty).toList) match {
      case ("GET", "schemas" :: "ids" :: id :: Nil) =>
        idFetches.incrementAndGet()
        schemasById.get(id.toInt) match {
          case Some(s) =>
            val node = mapper.createObjectNode(); node.put("schema", s)
            (200, node.toString)
          case None =>
            (404, """{"error_code":40403,"message":"Schema not found"}""")
        }
      case ("POST", "subjects" :: subject :: "versions" :: Nil) =>
        val body = new String(
          exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val schema = mapper.readTree(body).get("schema").asText
        val id = idBySchema.getOrElseUpdate(schema, {
          val next = schemasById.size + 1
          schemasById(next) = schema
          next
        })
        val versions = subjectVersions.getOrElse(subject, Vector.empty)
        if (!versions.contains(id)) subjectVersions(subject) = versions :+ id
        val node = mapper.createObjectNode(); node.put("id", id)
        (200, node.toString)
      case ("GET", "subjects" :: subject :: "versions" :: "latest" :: Nil) =>
        subjectVersions.get(subject).filter(_.nonEmpty) match {
          case Some(versions) =>
            val id = versions.last
            val node = mapper.createObjectNode()
            node.put("subject", subject); node.put("version", versions.size)
            node.put("id", id); node.put("schema", schemasById(id))
            (200, node.toString)
          case None =>
            (404, """{"error_code":40401,"message":"Subject not found"}""")
        }
      case _ =>
        (404, """{"error_code":404,"message":"HTTP 404 Not Found"}""")
    }
  }
}

/** Live registry-client goldens: the serde lifecycle of the reference's
  * Schema-Registry-backed serdes (SessionWindowsExample.java:158-160,
  * Schemas.java:77-83) against an in-process registry — register,
  * id-framed produce, per-record writer resolution over HTTP on decode,
  * forever-cached id fetches, and registry-error strict/lenient paths. */
class SchemaRegistrySpec extends SparkSpec {

  private def withRegistry(f: StubSchemaRegistry => Unit): Unit = {
    val reg = new StubSchemaRegistry().start()
    try { SchemaRegistryClient.clearCache(); f(reg) }
    finally { reg.stop(); SchemaRegistryClient.clearCache() }
  }

  private val evolvedSchemaJson: String =
    """{"type":"record","name":"Event","namespace":"graft.avro","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"},
      |{"name":"source","type":"string","default":"unknown"}]}""".stripMargin

  test("register is content-addressed; latest follows the subject's newest version") {
    withRegistry { reg =>
      val id1 = SchemaRegistryClient.register(reg.url, "events-value",
        AvroCodec.eventSchemaJson)
      val id1Again = SchemaRegistryClient.register(reg.url, "events-value",
        AvroCodec.eventSchemaJson)
      val id2 = SchemaRegistryClient.register(reg.url, "events-value",
        evolvedSchemaJson)
      assert(id1 === id1Again)
      assert(id1 !== id2)
      val (latestId, version, latestSchema) =
        SchemaRegistryClient.latest(reg.url, "events-value")
      assert(latestId === id2)
      assert(version === 2)
      assert(latestSchema === evolvedSchemaJson)
    }
  }

  test("mixed writer versions registered over HTTP resolve per record on decode") {
    import spark.implicits._
    withRegistry { reg =>
      // Producer side: two independent producers on different schema
      // versions of the same subject, each framing its registry id.
      val oldRows = Seq((1L, "click", 2.5), (2L, "view", 0.25))
        .toDF("event_id", "event_type", "value")
      val newRows = Seq((3L, "click", 1.5, "mobile"))
        .toDF("event_id", "event_type", "value", "source")
      val wire = AvroCodec.encodeWireRegistered(
          oldRows, reg.url, "events-value", AvroCodec.eventSchemaJson)
        .union(AvroCodec.encodeWireRegistered(
          newRows, reg.url, "events-value", evolvedSchemaJson))

      // Consumer side: reader compiled against the subject's latest.
      val (_, _, readerSchema) = SchemaRegistryClient.latest(reg.url, "events-value")
      val out = AvroCodec.decodeWireRegistry(wire, reg.url, readerSchema)
        .as[(Long, String, Double, String)].collect().toSet
      assert(out === Set((1L, "click", 2.5, "unknown"),
        (2L, "view", 0.25, "unknown"), (3L, "click", 1.5, "mobile")))
    }
  }

  test("id fetches are cached per JVM: one GET per distinct id across all partitions") {
    import spark.implicits._
    withRegistry { reg =>
      val rows = (1L to 64L).map(i => (i, "click", i * 0.5))
        .toDF("event_id", "event_type", "value").repartition(8)
      val wire = AvroCodec.encodeWireRegistered(
        rows, reg.url, "events-value", AvroCodec.eventSchemaJson)
      val n = AvroCodec.decodeWireRegistry(
        wire, reg.url, AvroCodec.eventSchemaJson).count()
      assert(n === 64)
      // 8 partitions decoded one writer id; the forever-cache collapses
      // them to a single registry hit.
      assert(reg.idFetches.get === 1)
    }
  }

  test("unknown id over HTTP fails strict, drops lenient (poison-pill parity)") {
    import spark.implicits._
    withRegistry { reg =>
      val rows = Seq((1L, "click", 2.5)).toDF("event_id", "event_type", "value")
      // frame with an id the registry never issued
      val wire = AvroCodec.encodeWire(rows, 999, AvroCodec.eventSchemaJson)
      val strict = intercept[Exception] {
        AvroCodec.decodeWireRegistry(
          wire, reg.url, AvroCodec.eventSchemaJson).collect()
      }
      assert(strict.getMessage != null)
      val kept = AvroCodec.decodeWireRegistry(
        wire, reg.url, AvroCodec.eventSchemaJson, lenient = true).count()
      assert(kept === 0)
    }
  }
}
