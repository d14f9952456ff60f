package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.nio.file.Files

/** Exactly-once-style delivery (§2.10): stateful streaming state survives a
  * query stop/restart through the checkpoint — the Spark analog of the
  * reference's EOS processing guarantee + changelog-restored stores
  * (MicroserviceUtils.java:83-84, OrderDetailsService.java:77-101). */
class RecoverySpec extends SparkSpec {
  import StreamOps._

  private def ts(ms: Long) = new Timestamp(ms)

  test("runningCount state survives a query restart via checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val in = MemoryStream[Event]
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Long]

    def start() = runningCount(in.toDS()).toDF()
      .writeStream
      .option("checkpointLocation", ckpt).outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => seen.put(r.getLong(0), r.getLong(2)))
      }.start()

    val q1 = start()
    in.addData(Event(0, ts(1000), 1, "w", 1.0), Event(1, ts(2000), 1, "w", 1.0))
    q1.processAllAvailable()
    quiesceAndStop(q1)

    // new query instance, same checkpoint: the per-key counter must resume
    // from 2, not restart at 0.
    val q2 = start()
    in.addData(Event(2, ts(3000), 1, "w", 1.0))
    q2.processAllAvailable()
    quiesceAndStop(q2)

    assert(seen.get(2L) === Some(3L), s"got $seen")
  }

  test("table-table join state survives a restart: a right update joins pre-restart left state") {
    // the KTable⋈KTable stores are changelog-restored in the reference;
    // Spark's analog is the flatMapGroupsWithState checkpoint. The left
    // value arrives BEFORE the restart, the right value after — the join
    // can only emit if the left state was recovered.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft-ttj-ckpt").toString
    val in = MemoryStream[TableUpdate]
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Option[String]]

    def start() = tableTableJoinChangelog(in.toDS()).toDF()
      .writeStream
      .option("checkpointLocation", ckpt).outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => seen.put(r.getLong(2), Option(r.getString(1))))
      }.start()

    val q1 = start()
    in.addData(TableUpdate("alice", "L", Some("europe"), 0L))
    q1.processAllAvailable()
    quiesceAndStop(q1)
    assert(seen.isEmpty, "left-only must not emit")

    val q2 = start()
    in.addData(TableUpdate("alice", "R", Some("1485500000"), 0L))
    q2.processAllAvailable()
    quiesceAndStop(q2)
    assert(seen.values.toSeq === Seq(Some("europe/1485500000")),
      s"right update must join the recovered left state, got $seen")
  }

  test("application reset: a fresh checkpoint reprocesses from scratch (ApplicationResetExample)") {
    // ApplicationResetExample.java: the reset tool rewinds input offsets
    // and wipes local state so the app reprocesses from the beginning.
    // Spark analog: point the query at a NEW checkpoint location — fresh
    // offsets AND fresh state (vs. the restart test above, which resumes).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    def run(ckpt: String): Map[Long, Long] = {
      val seen = scala.collection.concurrent.TrieMap.empty[Long, Long]
      val q = runningCount(in.toDS()).toDF()
        .writeStream.option("checkpointLocation", ckpt).outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => seen.put(r.getLong(0), r.getLong(2)))
        }.start()
      q.processAllAvailable(); quiesceAndStop(q)
      seen.toMap
    }
    in.addData(Event(10, ts(1000), 5, "w", 1.0), Event(11, ts(2000), 5, "w", 1.0))
    val first = run(Files.createTempDirectory("graft-reset1").toString)
    assert(first === Map(10L -> 1L, 11L -> 2L))
    // reset: new checkpoint => the SAME input replays and the counter
    // restarts at 1 instead of resuming at 3
    val second = run(Files.createTempDirectory("graft-reset2").toString)
    assert(second === Map(10L -> 1L, 11L -> 2L))
  }

  test("crash after sink write, before commit: replay + idempotent sink = no duplicates (EOS)") {
    // OrderDetailsService.java:77-107 produces transactionally so a crash
    // between produce and offset-commit cannot duplicate. Spark's analog:
    // a failed batch is REPLAYED with the same batchId after restart, so a
    // sink keyed on (batchId, row-key) — an idempotent/upsert sink — yields
    // exactly-once effects over at-least-once delivery.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft-eos").toString
    val in = MemoryStream[Event]
    val deliveries = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val sink = scala.collection.concurrent.TrieMap.empty[(Long, Long), Long]
    @volatile var armed = true

    def start() = in.toDS().toDF().select("event_id")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val ids = batch.collect().map(_.getLong(0))
        ids.foreach { id =>
          deliveries.synchronized { deliveries += ((bid, id)) } // at-least-once log
          sink.put((bid, id), id)                               // idempotent upsert
        }
        if (armed && ids.contains(2L)) {
          armed = false // crash AFTER the sink write, BEFORE the batch commits
          throw new RuntimeException("injected crash between sink write and commit")
        }
      }.start()

    val q1 = start()
    in.addData(Event(1, ts(1000), 1, "order", 1.0))
    q1.processAllAvailable()
    in.addData(Event(2, ts(2000), 1, "order", 2.0))
    intercept[Exception] { q1.processAllAvailable() }
    quiesceAndStop(q1)

    val q2 = start() // restart from the checkpoint: batch with event 2 replays
    q2.processAllAvailable()
    in.addData(Event(3, ts(3000), 1, "order", 3.0))
    q2.processAllAvailable()
    quiesceAndStop(q2)

    assert(sink.keySet.map(_._2) === Set(1L, 2L, 3L))
    assert(sink.size === 3, s"duplicate sink effects: ${sink.keySet}")
    val delivered2 = deliveries.count(_._2 == 2L)
    assert(delivered2 >= 2, s"expected a replay of event 2, deliveries=$deliveries")
  }

  test("incrementalTopN handles updates and tombstones like the add/subtract aggregate (TopArticles/KafkaMusic)") {
    // reference: the adder+subtractor pair of KafkaMusicExample.java:342-354
    // — an updated count displaces chart entries; a tombstone evicts.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamOps._
    val in = MemoryStream[ChangelogEntry]
    // capture the latest non-empty emission per batch explicitly (memory-sink
    // row order across batches is an implementation detail; foreachBatch is
    // not), ordered by chart position
    @volatile var latest: Seq[(Int, Long, Double)] = Nil
    val q = incrementalTopN(in.toDS(), 2).toDF()
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.where("group = 'punk'").orderBy("pos").collect()
          .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
        if (rows.nonEmpty) latest = rows
      }.start()
    def chart(): Seq[(Int, Long, Double)] = latest
    try {
      in.addData(ChangelogEntry("punk", 1L, Some(5.0)),
        ChangelogEntry("punk", 2L, Some(3.0)),
        ChangelogEntry("punk", 3L, Some(1.0)))
      q.processAllAvailable()
      assert(chart() === Seq((1, 1L, 5.0), (2, 2L, 3.0)))
      in.addData(ChangelogEntry("punk", 2L, Some(7.0))) // update displaces id1
      q.processAllAvailable()
      assert(chart() === Seq((1, 2L, 7.0), (2, 1L, 5.0)))
      in.addData(ChangelogEntry("punk", 2L, None)) // tombstone: id2 leaves
      q.processAllAvailable()
      assert(chart() === Seq((1, 1L, 5.0), (2, 3L, 1.0)))
    } finally quiesceAndStop(q)
  }

  test("incrementalTopNTws matches the fMGWS golden (updates, tombstones) on MapState") {
    // same KafkaMusic adder/subtractor golden as above, on the TWS port
    // whose per-member MapState makes a 1-member update a point write
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamOps._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[ChangelogEntry]
      @volatile var latest: Seq[(Int, Long, Double)] = Nil
      val q = incrementalTopNTws(in.toDS(), 2).toDF()
        .writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.where("group = 'punk'").orderBy("pos").collect()
            .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
          if (rows.nonEmpty) latest = rows
        }.start()
      try {
        in.addData(ChangelogEntry("punk", 1L, Some(5.0)),
          ChangelogEntry("punk", 2L, Some(3.0)),
          ChangelogEntry("punk", 3L, Some(1.0)))
        q.processAllAvailable()
        assert(latest === Seq((1, 1L, 5.0), (2, 2L, 3.0)))
        in.addData(ChangelogEntry("punk", 2L, Some(7.0))) // update displaces id1
        q.processAllAvailable()
        assert(latest === Seq((1, 2L, 7.0), (2, 1L, 5.0)))
        in.addData(ChangelogEntry("punk", 2L, None)) // tombstone: id2 leaves
        q.processAllAvailable()
        assert(latest === Seq((1, 1L, 5.0), (2, 3L, 1.0)))
      } finally quiesceAndStop(q)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incrementalTopN cap: evicted member re-enters the chart on a new update") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamOps._
    val in = MemoryStream[ChangelogEntry]
    @volatile var latest: Seq[(Int, Long, Double)] = Nil
    // n=2, margin=1 -> state capped at 3 members
    val q = incrementalTopN(in.toDS(), 2, margin = 1).toDF()
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.orderBy("pos").collect()
          .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
        if (rows.nonEmpty) latest = rows
      }.start()
    try {
      in.addData(ChangelogEntry("g", 1L, Some(10.0)), ChangelogEntry("g", 2L, Some(9.0)),
        ChangelogEntry("g", 3L, Some(8.0)), ChangelogEntry("g", 4L, Some(7.0)),
        ChangelogEntry("g", 5L, Some(6.0)))
      q.processAllAvailable()
      assert(latest === Seq((1, 1L, 10.0), (2, 2L, 9.0)))
      // ids 4 and 5 were evicted (state = {1,2,3}); tombstone the leader:
      // the chart refills from RETAINED state only (3 moves up, 4 cannot
      // passively reappear — the documented cap trade-off)
      in.addData(ChangelogEntry("g", 1L, None))
      q.processAllAvailable()
      assert(latest === Seq((1, 2L, 9.0), (2, 3L, 8.0)))
      // an evicted member updated back upward re-enters with the new value
      in.addData(ChangelogEntry("g", 5L, Some(20.0)))
      q.processAllAvailable()
      assert(latest === Seq((1, 5L, 20.0), (2, 2L, 9.0)))
    } finally quiesceAndStop(q)
  }

  test("music chart pipeline: filter -> broadcast join -> count -> topN (KafkaMusicExample)") {
    // reference topology: KafkaMusicExample.java:296-377 — play events
    // filtered to >=30s, joined to the songs table, counted per song, then
    // a per-genre top chart; here as the foreachBatch recompute the A7
    // streaming form prescribes.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val songs = Seq((1L, "punk", "Chemical Warfare"), (2L, "punk", "Fear of the Dark"),
      (3L, "rock", "Rocket Man")).toDF("song_id", "genre", "name")
    val plays = MemoryStream[(Long, Long)] // (song_id, duration_ms)
    val counts = plays.toDF().toDF("song_id", "duration")
      .filter(col("duration") >= 30000)
      .groupBy("song_id").count()
    var chart: Map[(String, Int), Long] = Map.empty
    val q = counts.writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val latest = batch.join(broadcast(songs), Seq("song_id"))
        chart = StreamOps.topN(latest, "genre", "count", "song_id", 1)
          .select("genre", "pos", "song_id").collect()
          .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      }.start()
    try {
      plays.addData((1L, 40000L), (1L, 35000L), (2L, 31000L), (2L, 10000L),
        (3L, 60000L))
      q.processAllAvailable()
    } finally quiesceAndStop(q)
    // song 1: 2 qualifying plays beats song 2 (1 play; its 10s play filtered)
    assert(chart === Map(("punk", 1) -> 1L, ("rock", 1) -> 3L))
  }
}
