package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.{GraftLog, GraftLogCommitMessage, GraftLogCommitter}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The graftlog DSv2 connector end-to-end: batch round-trip, partition
  * routing, streaming read with offset resume, exactly-once streaming
  * write across a restart, replayed-epoch idempotence, and dynamic topic
  * routing — the S1/S5/S6 wire behaviors, provable offline. */
class GraftLogSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graftlog-$name")
    d.toFile.deleteOnExit(); d.toString
  }

  test("batch write/read round-trip: offsets dense per partition, key routing sticky") {
    import spark.implicits._
    val topic = tmp("batch")
    val df = (0 until 100).map(i => (s"k${i % 10}", s"v$i")).toDF("key", "value")
    df.write.format("graftlog").option("partitions", "3").mode("append").save(topic)

    val back = spark.read.format("graftlog").load(topic)
      .withColumn("key", col("key").cast("string"))
      .withColumn("value", col("value").cast("string"))
    assert(back.count() === 100)
    // offsets are dense [0, n) within each partition
    val perPart = back.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"))
      .collect()
    assert(perPart.nonEmpty)
    perPart.foreach { r =>
      assert(r.getAs[Long]("lo") === 0L)
      assert(r.getAs[Long]("hi") === r.getAs[Long]("n") - 1)
    }
    // a key never spans partitions (hash routing is sticky)
    val spread = back.groupBy("key").agg(countDistinct("partition").as("np"))
      .filter(col("np") > 1).count()
    assert(spread === 0)
    // payloads survive byte-exact
    assert(back.select("key", "value").as[(String, String)].collect().toSet
      === df.as[(String, String)].collect().toSet)
  }

  test("streaming read resumes from checkpointed offsets (no reread, no loss)") {
    import spark.implicits._
    val topic = tmp("resume")
    val ckpt = tmp("resume-ckpt")
    Seq(("a", "1"), ("b", "2")).toDF("key", "value")
      .write.format("graftlog").option("partitions", "2").mode("append").save(topic)

    // drain through a graftlog OUT topic (the memory sink cannot recover
    // from a checkpoint): each run appends exactly the unseen records
    val outTopic = tmp("resume-out")
    def drain(): Long = {
      val q = Sources.writeLog(
        Sources.readLog(spark, topic).select("key", "value"), outTopic, ckpt).start()
      try q.processAllAvailable() finally quiesceAndStop(q)
      spark.read.format("graftlog").load(outTopic).count()
    }
    assert(drain() === 2)
    assert(drain() === 2) // no new input ⇒ re-run appends nothing

    // append AFTER the first runs; a fresh query on the SAME checkpoint
    // must see only the new records (offset resume, Kafka semantics)
    Seq(("a", "3"), ("c", "4"), ("d", "5")).toDF("key", "value")
      .write.format("graftlog").option("partitions", "2").mode("append").save(topic)
    assert(drain() === 5)
    val vals = spark.read.format("graftlog").load(outTopic)
      .select(col("value").cast("string")).as[String].collect().toSet
    assert(vals === Set("1", "2", "3", "4", "5"))
  }

  test("streaming write is exactly-once across restart; epoch replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val topic = tmp("eos")
    val ckpt = tmp("eos-ckpt")
    val in = MemoryStream[(String, String)]

    def run(feed: => Unit): Unit = {
      val q = Sources.writeLog(in.toDF().toDF("key", "value"), topic, ckpt).start()
      try { feed; q.processAllAvailable() } finally quiesceAndStop(q)
    }
    run { in.addData(("k1", "a"), ("k2", "b")) }
    run { in.addData(("k1", "c")) } // restart on same checkpoint
    val back = spark.read.format("graftlog").load(topic)
    assert(back.select(col("value").cast("string")).as[String].collect().sorted
      === Array("a", "b", "c"))

    // simulate Spark re-executing an already-committed epoch after crash
    // recovery: same (queryId, epochId) ⇒ the staged file must be
    // discarded, not appended
    val staged = Paths.get(topic, "_staging", "replay-probe")
    Files.createDirectories(staged.getParent)
    val out = new java.io.DataOutputStream(java.nio.file.Files.newOutputStream(staged))
    GraftLog.writeRecord(out, 0L, "k1".getBytes, "dup".getBytes)
    out.close()
    val msg = GraftLogCommitMessage(Seq((topic, 0, staged.toString, 1L)))
    GraftLogCommitter.commit(Array(msg), Some(GraftLogCommitter.Epoch("q-replay", 7L, topic)))  // first commit
    val afterFirst = spark.read.format("graftlog").load(topic).count()
    val staged2 = Paths.get(topic, "_staging", "replay-probe-2")
    val out2 = new java.io.DataOutputStream(java.nio.file.Files.newOutputStream(staged2))
    GraftLog.writeRecord(out2, 0L, "k1".getBytes, "dup".getBytes)
    out2.close()
    val msg2 = GraftLogCommitMessage(Seq((topic, 0, staged2.toString, 1L)))
    GraftLogCommitter.commit(Array(msg2), Some(GraftLogCommitter.Epoch("q-replay", 7L, topic))) // replay
    assert(spark.read.format("graftlog").load(topic).count() === afterFirst)
    assert(!Files.exists(staged2)) // staged file cleaned up, not leaked
  }

  test("startingOffsets=latest skips history; checkpoint resume ignores the option") {
    import spark.implicits._
    val topic = tmp("latest")
    val out = tmp("latest-out")
    val ckpt = tmp("latest-ckpt")
    Seq(("a", "old1"), ("b", "old2")).toDF("key", "value")
      .write.format("graftlog").option("partitions", "2").mode("append").save(topic)

    def drain(): Set[String] = {
      val q = Sources.writeLog(
        Sources.readLog(spark, topic, fromBeginning = false)
          .select("key", "value"), out, ckpt).start()
      try q.processAllAvailable() finally quiesceAndStop(q)
      spark.read.format("graftlog").load(out)
        .select(col("value").cast("string")).as[String].collect().toSet
    }
    assert(drain() === Set.empty) // history invisible at latest
    Seq(("a", "new1")).toDF("key", "value")
      .write.format("graftlog").option("partitions", "2").mode("append").save(topic)
    assert(drain() === Set("new1")) // resume: only post-start appends
  }

  test("dynamic topic routing: per-row topic column lands in per-topic logs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val broker = tmp("routed")
    val ckpt = tmp("routed-ckpt")
    val in = MemoryStream[(String, String, String)]
    val q = Sources.writeLogRouted(
      in.toDF().toDF("key", "value", "dest"), broker, "dest", ckpt).start()
    try {
      in.addData(("k1", "big-order", "alerts"), ("k2", "ok", "orders"),
        ("k3", "also-ok", "orders"))
      q.processAllAvailable()
    } finally quiesceAndStop(q)
    val alerts = spark.read.format("graftlog").load(s"$broker/alerts")
    val orders = spark.read.format("graftlog").load(s"$broker/orders")
    assert(alerts.select(col("value").cast("string")).as[String].collect().toSeq
      === Seq("big-order"))
    assert(orders.select(col("value").cast("string")).as[String].collect().toSet
      === Set("ok", "also-ok"))
  }

  test("retention: truncateBefore deletes whole old segments; survivors keep original offsets") {
    import spark.implicits._
    val topic = tmp("retention")
    // three appends to ONE partition = three segments of 2 records each
    for (g <- 0 until 3)
      Seq((s"g$g-a", g), (s"g$g-b", g)).toDF("value", "partition")
        .selectExpr("value", "CAST(0 AS INT) AS partition")
        .coalesce(1) // one task ⇒ one 2-record segment per append
        .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    val before = spark.read.format("graftlog").load(topic)
    assert(before.count() === 6)

    // cutoff at offset 3: segment [0,2) deleted, [2,4) straddles → kept
    val deleted = GraftLog.truncateBefore(Paths.get(topic), 0, 3L)
    assert(deleted === 1)
    val after = spark.read.format("graftlog").load(topic)
      .select(col("offset"), col("value").cast("string").as("value"))
      .as[(Long, String)].collect().sortBy(_._1)
    // survivors keep their ORIGINAL offsets (2..5) — retention moves the
    // log start, never renumbers
    assert(after.map(_._1).toSeq === Seq(2L, 3L, 4L, 5L))
    assert(after.map(_._2).toSeq === Seq("g1-a", "g1-b", "g2-a", "g2-b"))

    // a fresh earliest reader sees exactly the retained suffix
    val outTopic = tmp("retention-out")
    val q = Sources.writeLog(
      Sources.readLog(spark, topic).select("key", "value"),
      outTopic, tmp("retention-ckpt")).start()
    try q.processAllAvailable() finally quiesceAndStop(q)
    assert(spark.read.format("graftlog").load(outTopic).count() === 4)
  }

  test("compaction: latest-per-key kept with ORIGINAL offsets; tombstoned keys gone; " +
      "a fresh earliest reader reconstructs the S2 latest-per-key view") {
    import spark.implicits._
    val topic = tmp("compact")
    // three appends to one partition = three dense segments; k1 updated
    // twice, k2 tombstoned after a value, k3 written once, k4 tombstone-only
    def append(rows: Seq[(String, String)]): Unit =
      rows.toDF("key", "value").selectExpr("key", "value", "CAST(0 AS INT) AS partition")
        .coalesce(1)
        .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    append(Seq(("k1", "a"), ("k2", "b")))                  // offsets 0,1
    append(Seq(("k1", "c"), ("k3", "d")))                  // offsets 2,3
    append(Seq(("k2", null), ("k1", "e"), ("k4", null)))   // offsets 4,5,6
    val endBefore = GraftLog.endOffsets(Paths.get(topic))

    val removed = GraftLog.compactTopic(Paths.get(topic))
    assert(removed === 5) // 7 records → survivors k1@5, k3@3

    // offsets preserved, latest values only, tombstoned keys absent
    val after = spark.read.format("graftlog").load(topic)
      .select(col("offset"), col("key").cast("string").as("key"),
        col("value").cast("string").as("value"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(after.toSeq === Seq((3L, "k3", "d"), (5L, "k1", "e")))
    // the log END offset is untouched: compaction removes records, never
    // positions — the next append continues where it would have
    assert(GraftLog.endOffsets(Paths.get(topic)) === endBefore)
    append(Seq(("k5", "f")))
    assert(spark.read.format("graftlog").load(topic)
      .agg(max("offset")).head.getLong(0) === 7L)

    // a fresh earliest STREAMING reader over the compacted topic yields
    // exactly the latest-per-key table (builder.table semantics)
    val outTopic = tmp("compact-out")
    val q = Sources.writeLog(
      Sources.readLog(spark, topic).select("key", "value"),
      outTopic, tmp("compact-ckpt")).start()
    try q.processAllAvailable() finally quiesceAndStop(q)
    val view = spark.read.format("graftlog").load(outTopic)
      .select(col("key").cast("string"), col("value").cast("string"))
      .as[(String, String)].collect().toSet
    assert(view === Set(("k3", "d"), ("k1", "e"), ("k5", "f")))

    // re-compaction (cseg + a dense tail) stays correct
    GraftLog.compactTopic(Paths.get(topic))
    val again = spark.read.format("graftlog").load(topic)
      .select(col("offset"), col("key").cast("string"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(again.toSeq === Seq((3L, "k3"), (5L, "k1"), (7L, "k5")))
  }

  test("compaction then retention: a compacted segment straddling the cutoff survives whole; " +
      "appends after both continue at the preserved end offset") {
    import spark.implicits._
    val topic = tmp("compact-trunc")
    def append(rows: Seq[(String, String)]): Unit =
      rows.toDF("key", "value").selectExpr("key", "value", "CAST(0 AS INT) AS partition")
        .coalesce(1)
        .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    append(Seq(("a", "1"), ("b", "2")))  // offsets 0,1
    append(Seq(("a", "3"), ("c", "4")))  // offsets 2,3
    GraftLog.compactTopic(Paths.get(topic)) // one cseg [0,4): a@2, b@1, c@3
    append(Seq(("d", "5")))              // dense seg [4,5)
    // cutoff INSIDE the compacted range: the cseg straddles → whole
    // segment survives (Kafka's log cleaner never splits segments)
    val deleted = GraftLog.truncateBefore(Paths.get(topic), 0, 2L)
    assert(deleted === 0)
    val all = spark.read.format("graftlog").load(topic)
      .select(col("offset"), col("key").cast("string"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(all.toSeq === Seq((1L, "b"), (2L, "a"), (3L, "c"), (4L, "d")))
    // cutoff past the cseg: it deletes whole; the dense tail (active) stays
    val deleted2 = GraftLog.truncateBefore(Paths.get(topic), 0, 4L)
    assert(deleted2 === 1)
    assert(GraftLog.endOffsets(Paths.get(topic))(0) === 5L)
    append(Seq(("e", "6")))
    assert(spark.read.format("graftlog").load(topic)
      .agg(max("offset")).head.getLong(0) === 5L)
  }

  test("full truncation keeps the active segment: end offsets stay monotonic") {
    import spark.implicits._
    val topic = tmp("trunc-all")
    for (g <- 0 until 2)
      Seq((s"g$g-a", s"g$g-a"), (s"g$g-b", s"g$g-b")).toDF("key", "value")
        .selectExpr("value", "CAST(0 AS INT) AS partition").coalesce(1)
        .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    // cutoff PAST the end: the active segment survives (Kafka's rule), so
    // the end offset cannot reset to 0 and re-issue used offsets
    val deleted = GraftLog.truncateBefore(Paths.get(topic), 0, 99L)
    assert(deleted === 1) // only the non-active old segment
    assert(GraftLog.endOffsets(Paths.get(topic))(0) === 4L)
    Seq(("x", "x")).toDF("key", "value")
      .selectExpr("value", "CAST(0 AS INT) AS partition").coalesce(1)
      .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    // the new record gets offset 4, after every offset ever issued
    assert(spark.read.format("graftlog").load(topic)
      .agg(max("offset")).head.getLong(0) === 4L)
  }

  test("a missing mid-range segment fails the read loudly (no silent data loss)") {
    import spark.implicits._
    val topic = tmp("gap")
    for (g <- 0 until 3)
      Seq((s"g$g-a", s"g$g-b")).toDF("key", "value")
        .selectExpr("key", "value", "CAST(0 AS INT) AS partition").coalesce(1)
        .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    // delete the MIDDLE segment: [0,1) [1,2) [2,3) → [0,1) _ [2,3)
    val mid = GraftLog.segments(Paths.get(topic), 0)(1).path
    Files.delete(mid)
    val ex = intercept[Throwable] {
      spark.read.format("graftlog").load(topic).count()
    }
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("offset gap")) || mentions(t.getCause))
    assert(mentions(ex))
  }

  test("overlapping segments (two-committer corruption) fail the listing loudly") {
    import spark.implicits._
    val topic = tmp("overlap")
    Seq(("a", "1"), ("b", "2")).toDF("key", "value")
      .selectExpr("key", "value", "CAST(0 AS INT) AS partition").coalesce(1)
      .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    // forge a second committer's segment overlapping [1,3) against [0,2)
    val pd = GraftLog.partDir(Paths.get(topic), 0)
    val forged = pd.resolve(f"seg-${1L}%020d-2.bin")
    val out = new java.io.DataOutputStream(Files.newOutputStream(forged))
    GraftLog.writeRecord(out, 0L, "x".getBytes, "y".getBytes)
    GraftLog.writeRecord(out, 0L, "x2".getBytes, "y2".getBytes)
    out.close()
    val ex = intercept[IllegalStateException] {
      GraftLog.segments(Paths.get(topic), 0)
    }
    assert(ex.getMessage.contains("single committer"))
  }

  test("write validation: 'value' column required; routed write rejects null topics") {
    import spark.implicits._
    // no value column → planning-time failure, not silent null records
    val noValue = intercept[Throwable] {
      Seq(("k1", "t")).toDF("key", "other")
        .write.format("graftlog").option("partitions", "1").mode("append")
        .save(tmp("noval"))
    }
    assert(noValue.getMessage.contains("'value' column") ||
      Option(noValue.getCause).exists(_.getMessage.contains("'value' column")))
    // routed without topic column → planning-time failure
    val noTopic = intercept[Throwable] {
      Seq(("k1", "v")).toDF("key", "value")
        .write.format("graftlog").option("routed", "true").mode("append")
        .save(tmp("notopic"))
    }
    assert(noTopic.getMessage.contains("'topic' column") ||
      Option(noTopic.getCause).exists(_.getMessage.contains("'topic' column")))
    // routed with a NULL topic value → per-row failure naming the problem
    val nullTopic = intercept[org.apache.spark.SparkException] {
      Seq(("k1", "v", "dest"), ("k2", "v2", null))
        .toDF("key", "value", "topic")
        .write.format("graftlog").option("routed", "true").mode("append")
        .save(tmp("nulltopic"))
    }
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("null 'topic'")) || mentions(t.getCause))
    assert(mentions(nullTopic))
  }

  test("typed topic: Avro-encoded values round-trip the log byte-exact (serde parity)") {
    // the reference's SpecificAvroSerde wire shape: typed record → Avro
    // binary → topic bytes → Avro binary → typed record, with the log as
    // the byte transport (key/value are BinaryType, Kafka parity)
    import spark.implicits._
    import graft.functions.AvroCodec
    val topic = tmp("avro")
    val rows = Seq((1L, "play", 30.5), (2L, "pause", 0.0), (3L, "play", 7.25))
    val typed = rows.toDF("event_id", "event_type", "value")
    AvroCodec.encode(typed, AvroCodec.eventSchemaJson)
      .select(col("avro_bytes").as("value"))
      .write.format("graftlog").option("partitions", "2").mode("append").save(topic)

    val back = AvroCodec.decode(
      spark.read.format("graftlog").load(topic).select(col("value").as("avro_bytes")),
      AvroCodec.eventSchemaJson)
    assert(back.as[(Long, String, Double)].collect().toSet === rows.toSet)
  }

  test("full wire path: log → streaming wordcount → log (the WordCount lifecycle)") {
    import spark.implicits._
    val inTopic = tmp("wire-in")
    val outTopic = tmp("wire-out")
    val ckpt = tmp("wire-ckpt")
    Seq((null: String, "hello kafka streams"), (null: String, "hello graft"))
      .toDF("key", "value")
      .write.format("graftlog").option("partitions", "2").mode("append").save(inTopic)

    val counts = StreamOps.wordCount(Sources.readLog(spark, inTopic).select("value"))
      .select(col("word").as("key"), col("count").cast("string").as("value"))
    val q = counts.writeStream.format("graftlog")
      .outputMode("update")
      .option("path", outTopic)
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally quiesceAndStop(q)

    // latest record per key in the out log = final count (changelog semantics)
    val out = spark.read.format("graftlog").load(outTopic)
      .select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"), col("partition"), col("offset"))
    val latest = out.groupBy("key")
      .agg(max_by(col("value"), struct(col("partition"), col("offset"))).as("value"))
      .as[(String, String)].collect().toMap
    assert(latest === Map("hello" -> "2", "kafka" -> "1", "streams" -> "1", "graft" -> "1"))
  }

  test("cleanup.policy=compact: a long-running writer's topic self-compacts on the " +
      "commit path; earliest reader sees a consistent latest-per-key view") {
    import spark.implicits._
    val topic = tmp("policy")
    GraftLog.setCleanupPolicy(Paths.get(topic), "compact")
    def append(rows: Seq[(String, String)]): Unit =
      rows.toDF("key", "value").selectExpr("key", "value", "CAST(0 AS INT) AS partition")
        .coalesce(1)
        .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    // every append is one epoch commit; the SAME five keys are rewritten
    // each round, so the dirty ratio crosses 0.5 as soon as a second
    // segment lands — the policy check on the commit path must clean
    // WITHOUT any manual compactTopic call
    for (round <- 0 until 6)
      append((0 until 5).map(k => (s"k$k", s"r$round-$k")))
    val segs = GraftLog.segments(Paths.get(topic), 0)
    assert(segs.exists(!_.dense),
      s"no compacted segment after 6 commits under compact policy: " +
        segs.map(_.path.getFileName).mkString(","))
    // far fewer than 30 records survive on disk (the point of compaction)
    assert(segs.map(_.count).sum < 30)
    // the reader view is exactly latest-per-key with ORIGINAL offsets —
    // every k got its last write in round 5 (offsets 25..29)
    val view = spark.read.format("graftlog").load(topic)
      .select(col("offset"), col("key").cast("string"), col("value").cast("string"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val latest = view.groupBy(_._2).map { case (k, rs) => k -> rs.maxBy(_._1)._3 }
    assert(latest === (0 until 5).map(k => s"k$k" -> s"r5-$k").toMap)
    assert(view.map(_._1).toSet.subsetOf((0L until 30L).toSet))
    // offsets stay monotonic: the next append continues at 30
    append(Seq(("k9", "tail")))
    assert(spark.read.format("graftlog").load(topic)
      .agg(max("offset")).head.getLong(0) === 30L)
    // a topic WITHOUT the policy never self-compacts
    val plain = tmp("policy-none")
    for (round <- 0 until 6)
      (0 until 5).map(k => (s"k$k", s"r$round-$k")).toDF("key", "value")
        .selectExpr("key", "value", "CAST(0 AS INT) AS partition").coalesce(1)
        .write.format("graftlog").option("partitions", "1").mode("append").save(plain)
    assert(GraftLog.segments(Paths.get(plain), 0).forall(_.dense))
  }

  test("a scan planned BEFORE compaction reads through the swap: the lazy reader " +
      "falls back to the covering cseg instead of failing on the deleted path") {
    import spark.implicits._
    val topic = tmp("swap")
    def append(rows: Seq[(String, String)]): Unit =
      rows.toDF("key", "value").selectExpr("key", "value", "CAST(0 AS INT) AS partition")
        .coalesce(1)
        .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    append(Seq(("k1", "a"), ("k2", "b")))                 // offsets 0,1
    append(Seq(("k1", "c"), ("k3", "d")))                 // offsets 2,3
    append(Seq(("k2", null), ("k1", "e")))                // offsets 4,5
    // capture the PLANNED input partitions (the executor-side unit that
    // holds segment paths), exactly what an in-flight task would carry
    val scan = new graft.sources.GraftLogScan(topic).toBatch
    val planned = scan.planInputPartitions()
    val factory = scan.createReaderFactory()
    // now the swap: compaction replaces all three dense segments and
    // DELETES the originals — the planned paths are stale
    GraftLog.compactTopic(Paths.get(topic))
    assert(GraftLog.segments(Paths.get(topic), 0).forall(!_.dense))
    // driving the planned readers must NOT throw FileNotFoundException:
    // the open falls back to re-listing and resolving the covering cseg
    val rows = planned.flatMap { ip =>
      val r = factory.createReader(ip)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
      try while (r.next()) {
        val row = r.get()
        buf += ((row.getLong(4),
          new String(row.getBinary(0)),
          if (row.isNullAt(1)) null else new String(row.getBinary(1))))
      } finally r.close()
      buf
    }.sortBy(_._1)
    // the compacted view IS the correct content of the planned range:
    // latest-per-key survivors with original offsets (k2 tombstoned)
    assert(rows.toSeq === Seq((3L, "k3", "d"), (5L, "k1", "e")))
  }

  test("interleaved appends + policy compactions: every intermediate read is a " +
      "consistent latest-per-key view; offsets stay monotonic through repeated cleaning") {
    import spark.implicits._
    val topic = tmp("interleave")
    GraftLog.setCleanupPolicy(Paths.get(topic), "compact")
    def append(rows: Seq[(String, String)]): Unit =
      rows.toDF("key", "value").selectExpr("key", "value", "CAST(0 AS INT) AS partition")
        .coalesce(1)
        .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    var csegsSeen = 0
    for (round <- 0 until 10) {
      append((0 until 5).map(k => (s"k$k", s"r$round-$k")))
      // the read RIGHT AFTER each commit (which may have just compacted):
      // latest-per-key must be exactly this round's writes, offsets must
      // be original (within [0, 5*(round+1))) and strictly increasing
      val view = spark.read.format("graftlog").load(topic)
        .select(col("offset"), col("key").cast("string"), col("value").cast("string"))
        .as[(Long, String, String)].collect().sortBy(_._1)
      val latest = view.groupBy(_._2).map { case (k, rs) => k -> rs.maxBy(_._1)._3 }
      assert(latest === (0 until 5).map(k => s"k$k" -> s"r$round-$k").toMap,
        s"round $round: $latest")
      assert(view.map(_._1).distinct.length === view.length)
      assert(view.forall(_._1 < 5L * (round + 1)), s"round $round offsets: ${view.map(_._1).toSeq}")
      if (GraftLog.segments(Paths.get(topic), 0).exists(!_.dense)) csegsSeen += 1
    }
    // the policy actually cleaned, repeatedly — this wasn't a no-op walk
    assert(csegsSeen >= 3, s"policy compaction fired too rarely: $csegsSeen/10 rounds")
    assert(GraftLog.endOffsets(Paths.get(topic))(0) === 50L)
  }

  test("same-JVM compaction vs committer: concurrent threads serialize on the " +
      "monitor, never OverlappingFileLockException") {
    import spark.implicits._
    val topic = tmp("monitor")
    Seq(("k1", "a"), ("k1", "b"), ("k2", "c")).toDF("key", "value")
      .selectExpr("key", "value", "CAST(0 AS INT) AS partition").coalesce(1)
      .write.format("graftlog").option("partitions", "1").mode("append").save(topic)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { i =>
      new Thread(() => {
        try {
          for (_ <- 0 until 8)
            if (i % 2 == 0) GraftLog.compactPartition(Paths.get(topic), 0)
            else {
              // an epoch commit holding monitor+lock, racing the compactor
              val staged = Paths.get(topic, "_staging",
                java.util.UUID.randomUUID().toString)
              Files.createDirectories(staged.getParent)
              val out = new java.io.DataOutputStream(Files.newOutputStream(staged))
              GraftLog.writeRecord(out, 0L, "k1".getBytes, s"t$i".getBytes)
              out.close()
              GraftLogCommitter.commit(
                Array(GraftLogCommitMessage(Seq((topic, 0, staged.toString, 1L)))), None)
            }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent compaction/commit failed: ${errs.peek()}")
    // the log is still consistent: k1's latest is one of the committed
    // values and offsets are dense-or-compacted with no overlap
    val back = spark.read.format("graftlog").load(topic)
      .select(col("offset"), col("key").cast("string")).as[(Long, String)].collect()
    assert(back.map(_._1).distinct.length === back.length)
  }

  test("multi-topic epoch commit is all-or-nothing on replay: ONE marker at the " +
      "sink's BASE path; replay no-ops in EVERY topic even with different routing") {
    import spark.implicits._
    val base = tmp("txn-base")
    val tA = Paths.get(base, "topic-a").toString
    val tB = Paths.get(base, "topic-b").toString
    val tC = Paths.get(base, "topic-c").toString
    def stage(topic: String, name: String, v: String): (String, Int, String, Long) = {
      val p = Paths.get(topic, "_staging", name)
      Files.createDirectories(p.getParent)
      val out = new java.io.DataOutputStream(java.nio.file.Files.newOutputStream(p))
      GraftLog.writeRecord(out, 0L, "k".getBytes, v.getBytes)
      out.close()
      (topic, 0, p.toString, 1L)
    }
    val ep = GraftLogCommitter.Epoch("q-txn", 9L, base)
    def counts() = (
      spark.read.format("graftlog").load(tA).count(),
      spark.read.format("graftlog").load(tB).count())
    // epoch 9 touches BOTH topics in one commit
    GraftLogCommitter.commit(Array(GraftLogCommitMessage(
      Seq(stage(tA, "e9-a", "va"), stage(tB, "e9-b", "vb")))), Some(ep))
    assert(counts() === ((1L, 1L)))
    // the atomic commit point: exactly ONE marker, at the BASE path —
    // independent of which topics the epoch's rows routed to
    assert(Files.exists(Paths.get(base, "_epochs", "q-txn-9")))
    assert(!Files.exists(Paths.get(tA, "_epochs", "q-txn-9")))
    assert(!Files.exists(Paths.get(tB, "_epochs", "q-txn-9")))
    // full replay of the marked epoch: BOTH topics no-op, staging cleaned
    val r1 = stage(tA, "e9-a-replay", "va"); val r2 = stage(tB, "e9-b-replay", "vb")
    GraftLogCommitter.commit(Array(GraftLogCommitMessage(Seq(r1, r2))), Some(ep))
    assert(counts() === ((1L, 1L)))
    assert(!Files.exists(Paths.get(r1._3)) && !Files.exists(Paths.get(r2._3)))
    // ADVICE r12: a replay whose routing picked a DIFFERENT topic set
    // (nondeterministic source/routing) must STILL see the marker — the
    // base-path location is topic-set independent, so even a disjoint
    // set {C} no-ops instead of duplicating
    val r3 = stage(tC, "e9-c-replay", "vc")
    GraftLogCommitter.commit(Array(GraftLogCommitMessage(Seq(r3))), Some(ep))
    assert(spark.read.format("graftlog").load(tC).count() === 0L)
    assert(!Files.exists(Paths.get(r3._3)))
    // the crash-BEFORE-marker window stays at-least-once (Kafka's
    // non-transactional boundary): delete the marker and replay — the
    // WHOLE epoch re-appends, in both topics, never a partial mix
    Files.delete(Paths.get(base, "_epochs", "q-txn-9"))
    GraftLogCommitter.commit(Array(GraftLogCommitMessage(
      Seq(stage(tA, "e9-a-crash", "va"), stage(tB, "e9-b-crash", "vb")))),
      Some(ep))
    assert(counts() === ((2L, 2L)))
    // and the epoch is marked again: a THIRD replay no-ops everywhere
    GraftLogCommitter.commit(Array(GraftLogCommitMessage(
      Seq(stage(tA, "e9-a-3", "va"), stage(tB, "e9-b-3", "vb")))),
      Some(ep))
    assert(counts() === ((2L, 2L)))
  }
}
