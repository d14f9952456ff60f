package graft.streaming

import java.nio.file.{Files, Path, Paths}

import scala.collection.JavaConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The choreography's remaining process-isolation delta (VERDICT r10
  * task 3): the validator services run as genuinely SEPARATE OS
  * processes ([[ServiceRunner]] JVMs), coupled to this test's session
  * only through a shared graftlog topic directory — the reference's
  * EndToEndTest boots its microservices exactly this way, coupled only
  * by the broker. Asserted across the process boundary: orders flow
  * CREATED→VALIDATED; `kill -9` of a service and a respawn resumes from
  * its own checkpoint (new order processed, history untouched); the
  * exactly-once sink holds one verdict per (order, service) through the
  * kill; and two writer PROCESSES sharing one validations topic commit
  * without offset collisions (the committer's cross-process file lock). */
class CrossProcessChoreographySpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"xproc-$name")
    d.toFile.deleteOnExit(); d.toString
  }

  /** --add-opens of THIS (forked test) JVM, forwarded to children —
    * Spark on JDK 17+ needs them; reading them from the running JVM
    * keeps the list in one place (build.sbt). */
  private def moduleOpens: Seq[String] = {
    val raw = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val buf = scala.collection.mutable.Buffer.empty[String]
    val it = raw.iterator
    while (it.hasNext) {
      val a = it.next()
      if (a == "--add-opens" && it.hasNext) { buf += a; buf += it.next() }
      else if (a.startsWith("--add-opens=")) buf += a
    }
    buf.toSeq
  }

  private def spawn(role: String, orders: String, validations: String,
      states: String, ckpt: String, variant: String = "json"): (Process, Path) = {
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val ready = Paths.get(tmp(s"ready-$role"), "ready")
    val logFile = Paths.get(tmp(s"log-$role"), "out.log")
    val cmd = Seq(java) ++ moduleOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "-Dspark.ui.enabled=false",
      "graft.streaming.ServiceRunner",
      role, orders, validations, states, ckpt, ready.toString, variant)
    val pb = new ProcessBuilder(cmd.asJava)
    pb.directory(Files.createTempDirectory(s"xproc-cwd-$role").toFile)
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile.toFile)
    val proc = pb.start()
    val deadline = System.nanoTime() + 180L * 1000000000L
    while (!Files.exists(ready)) {
      if (!proc.isAlive)
        fail(s"$role service died on startup; log:\n" +
          new String(Files.readAllBytes(logFile)).takeRight(4000))
      if (System.nanoTime() > deadline) {
        proc.destroyForcibly()
        fail(s"$role service not ready in 180s; log:\n" +
          new String(Files.readAllBytes(logFile)).takeRight(4000))
      }
      Thread.sleep(250)
    }
    (proc, logFile)
  }

  private def awaitCount(topic: String, n: Long, what: String): Unit = {
    val deadline = System.nanoTime() + 180L * 1000000000L
    var seen = -1L
    while ({ seen = spark.read.format("graftlog").load(topic).count(); seen < n }) {
      if (System.nanoTime() > deadline)
        fail(s"timeout: $what — wanted $n records in $topic, saw $seen")
      Thread.sleep(500)
    }
  }

  test("two service PROCESSES over one shared log: flow across the boundary, " +
      "kill -9 + respawn resumes from checkpoint with EOS intact") {
    import spark.implicits._
    val orders = tmp("orders"); val validations = tmp("validations")
    val states = tmp("states")
    val ckDetails = tmp("ck-details"); val ckLimit = tmp("ck-limit")
    val ckAgg = tmp("ck-agg")

    def publishOrder(id: String, product: String, qty: Int, price: Double): Unit =
      Seq((id, s"""{"product":"$product","quantity":$qty,"price":$price}"""))
        .toDF("key", "value")
        .write.format("graftlog").option("partitions", "2").mode("append").save(orders)

    publishOrder("o1", "beer", 10, 5.0)    // clean: both PASS
    publishOrder("o2", "vodka", 20, 150.0) // 3000 >= 2000: LIMIT FAIL

    // two validator services, each its own JVM, sharing the validations
    // topic — their committers coordinate only via the topic file lock
    val (details1, _) = spawn("details", orders, validations, states, ckDetails)
    val (limit1, _) = spawn("limit", orders, validations, states, ckLimit)
    try {
      awaitCount(validations, 4, "initial verdicts from both processes")

      // kill -9 the details service, then publish a new order: the
      // surviving limit process keeps validating it
      details1.destroyForcibly(); details1.waitFor()
      publishOrder("o3", "whisky", 2, 100.0)
      awaitCount(validations, 5, "limit verdict for o3 after details died")

      // respawn details on its OWN checkpoint: it must resume — process
      // ONLY o3, never re-emit o1/o2 verdicts (EOS across kill -9)
      val (details2, _) = spawn("details", orders, validations, states, ckDetails)
      try awaitCount(validations, 6, "details verdict for o3 after respawn")
      finally { details2.destroyForcibly(); details2.waitFor() }
    } finally { limit1.destroyForcibly(); limit1.waitFor() }

    // aggregate IN THIS SESSION over the shared topic the processes wrote
    val agg = Choreography.startService(spark, "agg", orders, validations,
      states, ckAgg)
    try agg.processAllAvailable() finally quiesceAndStop(agg)

    val latest = spark.read.format("graftlog").load(states)
      .select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"), col("partition"), col("offset"))
      .groupBy("key")
      .agg(max_by(col("value"), struct(col("partition"), col("offset"))).as("state"))
      .as[(String, String)].collect().toMap
    assert(latest === Map(
      "o1" -> "VALIDATED", "o2" -> "FAILED", "o3" -> "VALIDATED"))

    // EOS through the kill: exactly one verdict per (order, service),
    // and the shared-topic offsets are collision-free by construction
    // (the read would throw on overlapping segments)
    val verdicts = spark.read.format("graftlog").load(validations)
      .select(col("key").cast("string").as("key"),
        get_json_object(col("value").cast("string"), "$.check").as("check"))
      .groupBy("key", "check").count().as[(String, String, Long)].collect()
    assert(verdicts.length === 6, s"expected 6 (order, service) verdicts: ${verdicts.toSeq}")
    assert(verdicts.forall(_._3 === 1L),
      s"duplicate verdicts: ${verdicts.filter(_._3 > 1).mkString(",")}")
  }

  test("typed wire across processes: registry-framed Avro end to end, two JVMs, " +
      "shared locked log") {
    // the reference's FULL deployment model composed: separate service
    // JVMs (EndToEndTest), binary registry-framed Avro on every topic
    // (Schemas.java), offsets owned by the cross-process locked committer
    import spark.implicits._
    import graft.functions.AvroCodec
    import org.apache.spark.sql.functions._
    val orders = tmp("w-orders"); val validations = tmp("w-validations")
    val states = tmp("w-states")

    def publishOrder(id: String, product: String, qty: Int, price: Double): Unit =
      AvroCodec.encodeWire(
        Seq((id, product, qty, price)).toDF("key", "product", "quantity", "price"),
        Choreography.OrderSchemaId, Choreography.orderAvroJson, keep = Seq("key"))
        .select(col("key").cast("binary").as("key"), col("avro_bytes").as("value"))
        .write.format("graftlog").option("partitions", "2").mode("append").save(orders)

    publishOrder("w1", "beer", 10, 5.0)    // both PASS
    publishOrder("w2", "vodka", 20, 150.0) // LIMIT FAIL

    val (d, _) = spawn("details", orders, validations, states, tmp("w-ck-d"), "wire")
    val (l, _) = spawn("limit", orders, validations, states, tmp("w-ck-l"), "wire")
    try awaitCount(validations, 4, "wire verdicts from both processes")
    finally {
      d.destroyForcibly(); l.destroyForcibly(); d.waitFor(); l.waitFor()
    }

    // aggregate in THIS session over the bytes the processes produced
    val agg = Choreography.startServiceWire(spark, "agg", orders, validations,
      states, tmp("w-ck-a"))
    try agg.processAllAvailable() finally quiesceAndStop(agg)

    val latestRaw = spark.read.format("graftlog").load(states)
      .groupBy(col("key"))
      .agg(max_by(col("value"), struct(col("partition"), col("offset"))).as("value"))
    val got = AvroCodec.decodeWire(latestRaw, Choreography.wireRegistry,
      Choreography.stateAvroJson, bytesCol = "value", keep = Seq("key"))
      .select(col("key").cast("string"), col("state"))
      .as[(String, String)].collect().toMap
    assert(got === Map("w1" -> "VALIDATED", "w2" -> "FAILED"))
    // every verdict the two processes wrote is registry-framed Avro
    val frames = spark.read.format("graftlog").load(validations)
      .select("value").as[Array[Byte]].collect()
    assert(frames.length === 4)
    frames.foreach { b =>
      assert(b(0) === 0x00.toByte)
      assert(((b(1) & 0xFF) << 24 | (b(2) & 0xFF) << 16 |
        (b(3) & 0xFF) << 8 | (b(4) & 0xFF)) === Choreography.VerdictSchemaId)
    }
  }
}
