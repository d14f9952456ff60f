package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.function.{Function => JFunction}

/** Minimal client for the public Confluent Schema Registry REST API — the
  * service every registry-backed serde in the reference resolves schemas
  * from (SessionWindowsExample.java:158-160 configures
  * `schema.registry.url`; Schemas.java:77-83 wires it into each serde).
  * Three endpoints cover the serde lifecycle:
  *
  *   - `POST /subjects/{subject}/versions` — register, returns the id the
  *     producer frames into every payload ([[AvroCodec.encodeWire]]).
  *   - `GET /schemas/ids/{id}` — resolve a framed id back to the writer's
  *     schema (the consumer-side hot path).
  *   - `GET /subjects/{subject}/versions/latest` — what a new consumer
  *     compiles its reader against.
  *
  * Ids are immutable once assigned, so resolved schemas cache forever in a
  * per-JVM map (the same forever-cache the reference's
  * `CachedSchemaRegistryClient` keeps). On a cluster that means each
  * EXECUTOR fetches a given id at most once, no matter how many tasks
  * decode it — `computeIfAbsent` also collapses concurrent first-misses
  * into one request. JDK `HttpURLConnection` + the Spark-classpath
  * jackson; no extra dependencies.
  */
object SchemaRegistryClient {

  private val mapper = new ObjectMapper()
  private val idCache = new ConcurrentHashMap[(String, Int), String]()

  /** Registry media type (public wire contract of the REST API). */
  private val ContentType = "application/vnd.schemaregistry.v1+json"

  /** Resolve a schema id to its schema JSON, caching forever per JVM.
    * Throws `IllegalArgumentException` on 404 (unknown id) — the same
    * failure [[AvroCodec.decodeWire]] raises for an id missing from a
    * local registry map, so strict/lenient semantics match. */
  def getById(baseUrl: String, id: Int): String =
    idCache.computeIfAbsent((baseUrl.stripSuffix("/"), id),
      new JFunction[(String, Int), String] {
        override def apply(k: (String, Int)): String = fetchById(k._1, k._2)
      })

  private def fetchById(baseUrl: String, id: Int): String = {
    val (code, body) = http("GET", s"$baseUrl/schemas/ids/$id", None)
    if (code != 200)
      throw new IllegalArgumentException(
        s"schema id $id not in registry ($code: ${errorMessage(body)})")
    mapper.readTree(body).get("schema").asText
  }

  /** Register a schema under a subject; returns the registry-assigned id
    * (identical schema content re-registers to the same id). */
  def register(baseUrl: String, subject: String, schemaJson: String): Int = {
    val payload = mapper.createObjectNode()
    payload.put("schema", schemaJson)
    val (code, body) = http("POST",
      s"${baseUrl.stripSuffix("/")}/subjects/$subject/versions",
      Some(payload.toString))
    if (code != 200)
      throw new IllegalArgumentException(
        s"register under '$subject' failed ($code: ${errorMessage(body)})")
    mapper.readTree(body).get("id").asInt
  }

  /** Latest version under a subject: (id, version, schema JSON). */
  def latest(baseUrl: String, subject: String): (Int, Int, String) = {
    val (code, body) = http("GET",
      s"${baseUrl.stripSuffix("/")}/subjects/$subject/versions/latest", None)
    if (code != 200)
      throw new IllegalArgumentException(
        s"subject '$subject' not in registry ($code: ${errorMessage(body)})")
    val node = mapper.readTree(body)
    (node.get("id").asInt, node.get("version").asInt, node.get("schema").asText)
  }

  /** Test hook: drop all cached id→schema entries. */
  def clearCache(): Unit = idCache.clear()

  private def errorMessage(body: String): String =
    try {
      val node = mapper.readTree(body)
      if (node.has("message")) node.get("message").asText else body.take(100)
    } catch { case _: Exception => body.take(100) }

  private def http(method: String, url: String,
      body: Option[String]): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(10000)
      conn.setRequestProperty("Accept", ContentType)
      body.foreach { b =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", ContentType)
        val os = conn.getOutputStream
        os.write(b.getBytes(StandardCharsets.UTF_8)); os.close()
      }
      val code = conn.getResponseCode
      val stream =
        if (code >= 400) conn.getErrorStream else conn.getInputStream
      (code, readAll(stream))
    } finally conn.disconnect()
  }

  private def readAll(in: InputStream): String = {
    if (in == null) return ""
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toString(StandardCharsets.UTF_8)
  }
}
