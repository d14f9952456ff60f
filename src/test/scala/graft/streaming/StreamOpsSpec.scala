package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Structured Streaming specs asserting the reference tests' golden
  * outputs over MemoryStream inputs (SURVEY.md §5 tier-1 mirror). */
class StreamOpsSpec extends SparkSpec {
  import StreamOps._

  private def ts(ms: Long) = new Timestamp(ms)

  /** Run a streaming query on a memory sink and return the named table. */
  private def runQuery(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode)(feed: => Unit): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try { feed; q.processAllAvailable() } finally quiesceAndStop(q)
  }

  test("wordCount matches WordCountLambdaExampleTest golden counts") {
    // reference: WordCountLambdaExampleTest.java:99-121
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    runQuery(wordCount(in.toDF()), "wc", OutputMode.Complete()) {
      in.addData("Hello Kafka Streams", "All streams lead to Kafka",
        "Join Kafka Summit", "И теперь пошли русские слова")
    }
    val got = spark.table("wc").as[(String, Long)].collect().toMap
    val expected = Map("hello" -> 1L, "all" -> 1L, "streams" -> 2L,
      "lead" -> 1L, "to" -> 1L, "join" -> 1L, "kafka" -> 3L, "summit" -> 1L,
      "и" -> 1L, "теперь" -> 1L, "пошли" -> 1L, "русские" -> 1L,
      "слова" -> 1L)
    assert(got === expected)
  }

  test("dedupWithTTL forwards first occurrence only (EventDeduplication golden)") {
    // reference: EventDeduplicationLambdaIntegrationTest.java:160-167
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("event_id", "ts")
    runQuery(dedupWithTTL(df, "event_id", "ts", "10 minutes"), "dd",
      OutputMode.Append()) {
      val ids = Seq("a", "b", "a", "a", "b", "c", "c", "a", "b")
      in.addData(ids.zipWithIndex.map { case (id, i) => (id, ts(1000L + i)) })
    }
    val got = spark.table("dd").select("event_id").as[String].collect().toSet
    assert(got === Set("a", "b", "c"))
    assert(spark.table("dd").count() === 3)
  }

  test("transformWithState dedup matches the dropDuplicates golden incl. cross-batch (EventDeduplication on TWS)") {
    // the TWS port of the reference's flagship Processor example: named
    // per-id ValueState with native TTL on RocksDB
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[IdEvent]
      // ids as in the dedupWithTTL golden: a b a a b c c a b → {a b c},
      // keyed numerically (a=1 b=2 c=3); TTL far beyond the test
      val ids = Seq(1L, 2L, 1L, 1L, 2L, 3L, 3L, 1L, 2L)
      // explicit trigger interval: with TimeMode.ProcessingTime the query
      // re-triggers forever (shouldRunAnotherBatch) — under the default
      // 0 ms trigger it is ALWAYS mid-batch, so quiesceAndStop could
      // never find an idle window and stop() interrupted a RocksDB
      // commit mid-upload (the CANNOT_COMMIT noise this suite pins down)
      val q = dedupWithTTLTws(in.toDS(), java.time.Duration.ofMinutes(10)).toDF()
        .writeStream.format("memory").queryName("ddtws")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
        .outputMode("append").start()
      // CANNOT processAllAvailable() here: with ProcessingTime time mode
      // (required by TTLConfig) TransformWithStateExec reports
      // shouldRunAnotherBatch=true on every batch — the query legitimately
      // never reaches the noNewData state, so processAllAvailable blocks
      // forever. Poll the sink to the expected count instead.
      def awaitCount(n: Long): Unit = {
        val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
        while (spark.table("ddtws").count() < n) {
          q.exception.foreach(throw _)
          assert(System.nanoTime < deadline, s"timed out waiting for $n rows")
          Thread.sleep(100)
        }
      }
      try {
        in.addData(ids.zipWithIndex.map { case (id, i) => IdEvent(id, ts(1000L + i), i) })
        awaitCount(3)
        // cross-batch: every id re-sent in a later batch is still a dup
        // (the seen marker lives in the store, not the batch); give the
        // dup-only ids a full extra batch to leak before asserting
        in.addData(Seq(IdEvent(1L, ts(5000), 100), IdEvent(3L, ts(5001), 101),
          IdEvent(4L, ts(5002), 102)))
        awaitCount(4)
        Thread.sleep(500) // a leaked duplicate would land in this window
      } finally quiesceAndStop(q)
      val got = spark.table("ddtws").as[IdEvent].collect()
      assert(got.map(_.event_id).toSet === Set(1L, 2L, 3L, 4L))
      assert(got.length === 4, s"duplicates leaked: ${got.toSeq}")
      // first occurrence won: payload is the earliest index per id
      assert(got.map(e => e.event_id -> e.payload).toMap
        === Map(1L -> 0L, 2L -> 1L, 3L -> 5L, 4L -> 102L))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("runningCount emits per-record ever-incrementing counts (StateStoresInTheDSL golden)") {
    // reference: StateStoresInTheDSLIntegrationTest.java:110-125 — keys
    // foo=1, bar=2, quux=3 in arrival order.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val keyed = Seq(1L, 2L, 1L, 3L, 2L, 1L) // foo bar foo quux bar foo
    runQuery(runningCount(in.toDS()).toDF(), "rc", OutputMode.Update()) {
      in.addData(keyed.zipWithIndex.map { case (k, i) =>
        Event(i.toLong, ts(1000L + i), k, "word", 1.0) })
    }
    val got = spark.table("rc").as[Counted].collect()
      .sortBy(_.event_id).map(c => (c.user_id, c.seq)).toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 1L), (2L, 2L), (1L, 3L)))
  }

  test("transformWithState running count matches the flatMapGroupsWithState golden (Processor API)") {
    // the Spark 4 typed Processor-API analog: named ValueState on RocksDB
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val keyed = Seq(1L, 2L, 1L, 3L, 2L, 1L) // foo bar foo quux bar foo
      runQuery(runningCountTws(in.toDS()).toDF(), "rctws", OutputMode.Update()) {
        in.addData(keyed.zipWithIndex.map { case (k, i) =>
          Event(i.toLong, ts(1000L + i), k, "word", 1.0) })
      }
      val got = spark.table("rctws").as[Counted].collect()
        .sortBy(_.event_id).map(c => (c.user_id, c.seq)).toSeq
      assert(got === Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 1L), (2L, 2L), (1L, 3L)))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("sessionCountsTws (TWS port #5, event-time timers) merges sessions and emits at close") {
    // the session MERGER on explicit timer lifecycle: registerTimer at
    // every (re)extension, handleExpiredTimer closes sessions when the
    // event-time watermark passes end+gap — SessionWindowsExampleTest
    // semantics (incl. the bridging merge) with suppression-until-close
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val q = sessionCountsTws(in.toDS(), 10000L, "60 seconds").toDF()
        .writeStream.format("memory").queryName("sesstws")
        .outputMode("append").start()
      try {
        // base offset: rows at event time <= the INITIAL watermark (0)
        // would be dropped as late — same rule as any event-time operator
        val b = 100000L
        // u1: a 3-event session + a separate singleton; u2: singleton;
        // u3: two sessions a later bridge must collapse
        in.addData(
          Event(0, ts(b), 1, "c", 1.0), Event(1, ts(b + 4000), 1, "c", 1.0),
          Event(2, ts(b + 8000), 1, "c", 1.0), Event(3, ts(b + 30000), 1, "c", 1.0),
          Event(4, ts(b), 2, "c", 1.0),
          Event(5, ts(b), 3, "c", 1.0), Event(6, ts(b + 20000), 3, "c", 1.0))
        q.processAllAvailable()
        // the LATE bridge (within grace): u3's two sessions become ONE
        in.addData(Event(7, ts(b + 10000), 3, "c", 1.0))
        q.processAllAvailable()
        // advance the watermark past every close, then one more batch so
        // the armed timers fire under the advanced watermark
        in.addData(Event(8, ts(b + 600000), 99, "c", 1.0)); q.processAllAvailable()
        in.addData(Event(9, ts(b + 610000), 99, "c", 1.0)); q.processAllAvailable()
      } finally quiesceAndStop(q)
      val b = 100000L
      val got = spark.table("sesstws").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_start.getTime - b,
          s.session_end.getTime - b, s.cnt))
        .toSet
      assert(got === Set(
        (1L, 0L, 8000L, 3L), (1L, 30000L, 30000L, 1L),
        (2L, 0L, 0L, 1L),
        (3L, 0L, 20000L, 3L))) // merged by the bridge — one session, count 3
      // u99 (the watermark advancer) is still OPEN: suppression means no row
      assert(!spark.table("sesstws").as[SessionOut].collect().exists(_.user_id == 99L))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("runningCount state persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val df = runningCount(in.toDS()).toDF()
    val q = df.writeStream.format("memory").queryName("rc2")
      .outputMode("update").start()
    try {
      in.addData(Event(0, ts(1000), 1, "w", 1.0)); q.processAllAvailable()
      in.addData(Event(1, ts(2000), 1, "w", 1.0)); q.processAllAvailable()
      in.addData(Event(2, ts(3000), 1, "w", 1.0)); q.processAllAvailable()
    } finally quiesceAndStop(q)
    val got = spark.table("rc2").as[Counted].collect().sortBy(_.event_id).map(_.seq)
    assert(got.toSeq === Seq(1L, 2L, 3L))
  }

  test("windowedJoin left_outer emits matched and not-clicked-yet rows (StreamToStreamJoin golden)") {
    // reference: StreamToStreamJoinIntegrationTest.java:70-75 — the
    // car-advertisement impression has no click and must surface
    // null-padded once the watermark passes the join window.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[(String, Timestamp, String)]
    val clicks = MemoryStream[(String, Timestamp, String)]
    val impDf = imps.toDF().toDF("key", "ts", "value")
    val clkDf = clicks.toDF().toDF("key", "ts", "value")
    val joined = windowedJoin(impDf, clkDf, "key", "5 seconds", "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      imps.addData(("newspaper-ad", ts(1000), "shown"),
        ("gadget-ad", ts(2000), "shown"), ("car-ad", ts(3000), "shown"))
      clicks.addData(("newspaper-ad", ts(2500), "clicked"),
        ("gadget-ad", ts(4000), "clicked"))
      q.processAllAvailable()
      // advance both watermarks far past the windows to close car-ad
      imps.addData(("late-ad", ts(100000), "shown"))
      clicks.addData(("late-click", ts(100000), "clicked"))
      q.processAllAvailable()
      q.processAllAvailable()
    } finally quiesceAndStop(q)
    val rows = spark.table("ssj")
      .selectExpr("l_key", "l_value", "r_value").collect()
      .map(r => (r.getString(0), r.getString(1), if (r.isNullAt(2)) null else r.getString(2)))
      .toSet
    assert(rows.contains(("newspaper-ad", "shown", "clicked")))
    assert(rows.contains(("gadget-ad", "shown", "clicked")))
    assert(rows.contains(("car-ad", "shown", null)), s"got $rows")
  }

  test("sessionCounts merges events within the gap and splits across it") {
    // semantics of SessionWindowsExample.java:157-172 (gap sessions)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp)]
    val df = in.toDF().toDF("user_id", "ts")
    val agg = sessionCounts(df, "ts", "user_id", "10 seconds", "0 seconds")
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // session 1: 3 events within 10s of each other; session 2: one event
      // 60s later; then a watermark-advancing event.
      in.addData((1L, ts(1000)), (1L, ts(5000)), (1L, ts(12000)),
        (1L, ts(70000)))
      q.processAllAvailable()
      in.addData((99L, ts(500000)))
      q.processAllAvailable()
      q.processAllAvailable()
    } finally quiesceAndStop(q)
    val got = spark.table("sess").where("user_id = 1")
      .selectExpr("cnt").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1L, 3L))
  }

  test("hoppingCounts lands each event in size/slide windows (PageViewRegion windowing)") {
    // reference: PageViewRegionLambdaExample.java:183 — 5-min windows
    // advancing 1 min => every event belongs to 5 windows.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp)]
    val df = in.toDF().toDF("key", "ts")
    val agg = hoppingCounts(df, "ts", "key", "5 minutes", "1 minute", "0 seconds")
    val q = agg.writeStream.format("memory").queryName("hop")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(600000))) // 10:00 into [05:00..10:00]..[10:00..15:00]
      q.processAllAvailable()
      in.addData((99L, ts(100000000))) // close all windows
      q.processAllAvailable(); q.processAllAvailable()
    } finally quiesceAndStop(q)
    val rows = spark.table("hop").where("key = 1").collect()
    assert(rows.length === 5, s"event must appear in 5 hopping windows, got ${rows.length}")
    assert(rows.forall(_.getLong(2) === 1L))
  }

  test("session merge: a bridging event collapses two sessions into one (SessionWindowsExampleTest)") {
    // reference: SessionWindowsExampleTest.java:86-139 — two sessions a
    // gap+1 apart, then an event between them merges everything into one
    // 3-count session. Spark emits the merged final (the reference
    // additionally emits tombstones for the merged partials — changelog
    // detail documented in SURVEY.md §7.4).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val gapMs = 10000L
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("user_id", "ts")
    val agg = sessionCounts(df, "ts", "user_id", "10 seconds", "0 seconds")
    val q = agg.writeStream.format("memory").queryName("merge")
      .outputMode("append").start()
    try {
      in.addData(("erica", ts(1000)), ("erica", ts(1000 + gapMs + 1)),
        ("erica", ts(1000 + gapMs / 2)))
      q.processAllAvailable()
      in.addData(("zz", ts(10000000))) // advance watermark to close windows
      q.processAllAvailable(); q.processAllAvailable()
    } finally quiesceAndStop(q)
    val rows = spark.table("merge").where("user_id = 'erica'")
      .selectExpr("cnt", "session_start").collect()
    assert(rows.length === 1, "partials must merge into one session")
    assert(rows.head.getLong(0) === 3L)
    assert(rows.head.getTimestamp(1) === ts(1000))
  }

  test("session merge CHANGELOG: tombstones for merged windows, then the merged session (SessionWindowsExampleTest golden)") {
    // reference: SessionWindowsExampleTest.java:125-137 — the exact
    // update-mode sequence: session1 (1), session2 (1), then the bridging
    // event emits tombstone(session1), tombstone(session2),
    // merged(start→second, 3). Events are fed as separate micro-batches in
    // ARRIVAL order (the pipeInput analog); emissions are ordered by the
    // per-key seq the operator assigns, not by sink row order.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val gapMs = 10000L
    val start = 1000L
    val second = start + gapMs + 1
    val mergeT = start + gapMs / 2
    val in = MemoryStream[SessionEvent]
    val q = sessionChangelog(in.toDS(), gapMs)
      .writeStream.format("memory").queryName("schg")
      .outputMode("update").start()
    try {
      Seq(start, second, mergeT).foreach { t =>
        in.addData(SessionEvent("erica", ts(t)))
        q.processAllAvailable()
      }
    } finally quiesceAndStop(q)
    val got = spark.table("schg")
      .as[SessionChange].collect().sortBy(_.seq)
      .map(c => (c.start, c.end, c.cnt)).toSeq
    assert(got === Seq(
      (start, start, Some(1L)),   // first lone session
      (second, second, Some(1L)), // second lone session
      (start, start, None),       // tombstone: merged away
      (second, second, None),     // tombstone: merged away
      (start, second, Some(3L)))) // the merged session
  }

  test("session extension emits a tombstone for the old window, then the widened session") {
    // the other changelog corner: a single session GROWING also re-keys
    // its window, so the old (start,end) entry must tombstone before the
    // widened one emits — same rule that drives the merge sequence.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SessionEvent]
    val q = sessionChangelog(in.toDS(), 10000L)
      .writeStream.format("memory").queryName("sext")
      .outputMode("update").start()
    try {
      Seq(1000L, 5000L).foreach { t =>
        in.addData(SessionEvent("bob", ts(t)))
        q.processAllAvailable()
      }
    } finally quiesceAndStop(q)
    val got = spark.table("sext").as[SessionChange].collect().sortBy(_.seq)
      .map(c => (c.start, c.end, c.cnt)).toSeq
    assert(got === Seq(
      (1000L, 1000L, Some(1L)), // lone session
      (1000L, 1000L, None),     // tombstone: window grows
      (1000L, 5000L, Some(2L))))// widened session
  }

  test("session retention: a late event beyond retention starts fresh instead of merging") {
    // reference: SessionWindows retention — the store drops sessions past
    // (observed stream time - retention), so a too-late event cannot merge.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SessionEvent]
    val q = sessionChangelog(in.toDS(), gapMs = 10000L, retentionMs = 20000L)
      .writeStream.format("memory").queryName("sret")
      .outputMode("update").start()
    try {
      Seq(1000L, 100000L, 1005L).foreach { t =>
        in.addData(SessionEvent("kai", ts(t)))
        q.processAllAvailable()
      }
    } finally quiesceAndStop(q)
    val got = spark.table("sret").as[SessionChange].collect().sortBy(_.seq)
      .map(c => (c.start, c.end, c.cnt)).toSeq
    assert(got === Seq(
      (1000L, 1000L, Some(1L)),     // original session
      (100000L, 100000L, Some(1L)), // far-future event advances stream time
      (1005L, 1005L, Some(1L))))    // late event: the 1000-session was
                                    // evicted, so NO tombstone+merge — fresh
  }

  test("incremental table-table join re-emits on updates from either side (TableToTableJoinIntegrationTest golden)") {
    // reference: TableToTableJoinIntegrationTest.java:60-113 — regions
    // piped first (no emissions: right side empty), then each login
    // update joins against the CURRENT region; a later region (left-side)
    // update re-emits against the latest login.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TableUpdate]
    val q = tableTableJoinChangelog(in.toDS())
      .writeStream.format("memory").queryName("ttj")
      .outputMode("update").start()
    def feed(us: (String, String, Option[String])*): Unit = {
      in.addData(us.zipWithIndex.map { case ((k, s, v), i) =>
        TableUpdate(k, s, v, i.toLong) })
      q.processAllAvailable()
    }
    try {
      // batch 1: all region (left) records — right side empty, no output
      feed(("alice", "L", Some("asia")), ("bob", "L", Some("europe")),
        ("alice", "L", Some("europe")), ("charlie", "L", Some("europe")),
        ("bob", "L", Some("asia")))
      assert(spark.table("ttj").count() === 0,
        "left-only updates must not emit for an inner join")
      // batches 2-5: login (right) records, one per batch like pipeInput
      feed(("alice", "R", Some("1485500000")))
      feed(("bob", "R", Some("1485520000")))
      feed(("alice", "R", Some("1485530000")))
      feed(("bob", "R", Some("1485560000")))
      // left-side update AFTER logins: re-emits with the latest right value
      feed(("alice", "L", Some("africa")))
      // tombstone on the right retracts the join result exactly once
      feed(("bob", "R", None))
      feed(("bob", "L", Some("oceania"))) // right still absent: no emission
    } finally quiesceAndStop(q)
    val got = spark.table("ttj").as[TableJoined].collect()
      .groupBy(_.key).view.mapValues(_.sortBy(_.seq).map(_.value).toSeq).toMap
    assert(got("alice") === Seq(Some("europe/1485500000"),
      Some("europe/1485530000"), Some("africa/1485530000")))
    assert(got("bob") === Seq(Some("asia/1485520000"),
      Some("asia/1485560000"), None))
    assert(!got.contains("charlie"), "charlie never has a right side")
  }

  test("late events beyond the watermark are dropped (CustomWindowTest late-arrival)") {
    // reference: window/CustomWindowTest.java:133 — a record later than
    // window end + grace is discarded.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp)]
    val df = in.toDF().toDF("key", "ts")
    val agg = tumblingCounts(df, "ts", "key", "10 seconds", "5 seconds")
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(1000)), (1L, ts(2000)))
      q.processAllAvailable()
      in.addData((1L, ts(60000))) // watermark -> 55s; window [0,10s) closes
      q.processAllAvailable()
      in.addData((1L, ts(3000)))  // 52s late: must be dropped
      q.processAllAvailable()
      in.addData((1L, ts(120000)))
      q.processAllAvailable(); q.processAllAvailable()
    } finally quiesceAndStop(q)
    val w0 = spark.table("late")
      .where("window_start = timestamp'1970-01-01 00:00:00'")
      .selectExpr("cnt").collect()
    assert(w0.map(_.getLong(0)).toSeq === Seq(2L), "late event must not count")
  }

  test("suppression (W6): append emits nothing before window+grace closes, exactly one final per window") {
    // reference: window/CustomWindowTest.java:281-293 — suppress(
    // untilWindowCloses): no intermediate emissions, one final result per
    // window once the watermark passes window end + grace.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp)]
    val df = in.toDF().toDF("key", "ts")
    val agg = tumblingCounts(df, "ts", "key", "1 minute", "10 seconds")
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Seq[(Timestamp, Long)]]
    val q = agg.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch.synchronized {
          perBatch += batch.select("window_start", "cnt").collect()
            .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
        }
        ()
      }.start()
    try {
      in.addData((1L, ts(10000)), (1L, ts(20000))); q.processAllAvailable()
      // suppression: watermark (10s) is inside the window — nothing emitted
      assert(perBatch.flatten.isEmpty, s"early emission: $perBatch")
      in.addData((1L, ts(50000))); q.processAllAvailable() // wm=40s: still open
      assert(perBatch.flatten.isEmpty, s"early emission: $perBatch")
      in.addData((1L, ts(95000))); q.processAllAvailable() // wm=85s>60s: [0,60) finalizes
      in.addData((1L, ts(30000))); q.processAllAvailable() // late (wm 85s): dropped, no re-emission
      in.addData((1L, ts(210000)))
      q.processAllAvailable(); q.processAllAvailable()     // wm=200s: [60,120) finalizes
    } finally quiesceAndStop(q)
    val all = perBatch.flatten
    assert(all.count(_._1 == ts(0)) === 1, s"exactly one final for [0,60): $all")
    assert(all.find(_._1 == ts(0)).get._2 === 3L, "late event must not re-open or re-count")
    assert(all.count(_._1 == ts(60000)) === 1, s"exactly one final for [60,120): $all")
    assert(all.find(_._1 == ts(60000)).get._2 === 1L)
  }

  test("interactive queries: top-five chart lookup by name from the live memory table (MusicPlaysRestService)") {
    // reference: interactivequeries/kafkamusic/MusicPlaysRestService.java
    // top-five read path — the serving layer queries the materialized
    // chart by store name while the stream keeps updating it.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val songs = Seq((1L, "punk", "Chemical Warfare"), (2L, "punk", "Fear of the Dark"),
      (3L, "rock", "Rocket Man")).toDF("song_id", "genre", "name")
    val plays = MemoryStream[(Long, Long)] // (song_id, duration_ms)
    val counts = plays.toDF().toDF("song_id", "duration")
      .filter(col("duration") >= 30000)
      .join(broadcast(songs), Seq("song_id"))
      .groupBy("genre", "song_id", "name").count()
    val q = Sources.serveAsTable(counts, "music_charts").start()
    def topFive(genre: String): Seq[(Long, Long)] =
      spark.sql(s"SELECT song_id, count FROM music_charts WHERE genre = '$genre' " +
          "ORDER BY count DESC, song_id ASC LIMIT 5")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    try {
      plays.addData((1L, 40000L), (2L, 31000L), (2L, 35000L), (3L, 60000L))
      q.processAllAvailable()
      assert(topFive("punk") === Seq((2L, 2L), (1L, 1L)))
      assert(topFive("rock") === Seq((3L, 1L)))
      // the chart is LIVE: new plays re-rank the lookup
      plays.addData((1L, 50000L), (1L, 45000L), (3L, 10000L)) // 10s play filtered
      q.processAllAvailable()
      assert(topFive("punk") === Seq((1L, 3L), (2L, 2L)))
      assert(topFive("rock") === Seq((3L, 1L)))
    } finally quiesceAndStop(q)
  }

  test("interactive queries: a second session reads the served chart (MetadataService remote lookup)") {
    // reference: interactivequeries/MetadataService.java:1-93 — another
    // app instance discovers and queries the store. Spark analog: the
    // chart is published per batch as a GLOBAL temp view, readable from
    // any SparkSession of the app (spark.newSession() here).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val plays = MemoryStream[(String, Long)] // (genre, song_id)
    val counts = plays.toDF().toDF("genre", "song_id").groupBy("genre", "song_id").count()
    val q = counts.writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // materialize the chart snapshot, then publish it app-wide
        val snap = batch.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        snap.toSeq.toDF("genre", "song_id", "count")
          .createOrReplaceGlobalTempView("served_chart")
      }.start()
    try {
      plays.addData(("punk", 1L), ("punk", 1L), ("rock", 2L))
      q.processAllAvailable()
      val second = spark.newSession()
      val got = second.sql("SELECT song_id, count FROM global_temp.served_chart " +
          "WHERE genre = 'punk' ORDER BY count DESC, song_id LIMIT 5")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === Seq((1L, 2L)))
    } finally quiesceAndStop(q)
  }

  test("CQRS long-poll: a reader blocks until the write materializes (OrdersService)") {
    // reference: microservices/OrdersService.java:141-228 — GET /orders/{id}
    // parks the request until the order reaches the materialized view.
    // Spark analog: poll the served table until the micro-batch containing
    // the order commits.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val in = MemoryStream[(Long, String)]
    val q = Sources.serveAsTable(in.toDF().toDF("order_id", "state"),
      "orders_view", "append").start()
    def lookup(id: Long) = spark.table("orders_view")
      .where(col("order_id") === id).collect()
    try {
      in.addData((1L, "CREATED")); q.processAllAvailable()
      assert(lookup(42L).isEmpty) // not yet written: the reader would park
      val reader = Future { // the parked GET
        val deadline = System.nanoTime + 10_000_000_000L
        var rows = lookup(42L)
        while (rows.isEmpty && System.nanoTime < deadline) {
          Thread.sleep(50); rows = lookup(42L)
        }
        rows
      }
      in.addData((42L, "VALIDATED")); q.processAllAvailable()
      val got = Await.result(reader, scala.concurrent.duration.Duration(15, "s"))
      assert(got.nonEmpty && got.head.getString(1) === "VALIDATED")
    } finally quiesceAndStop(q)
  }

  test("latestPerKey keeps the newest value per key across batches (KTable semantics)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = latestPerKey(in.toDS()).toDF().writeStream.format("memory")
      .queryName("lpk").outputMode("update").start()
    try {
      in.addData(Event(0, ts(1000), 1, "signup", 1.0),
        Event(1, ts(2000), 1, "click", 2.0))
      q.processAllAvailable()
      in.addData(Event(2, ts(1500), 1, "stale", 9.0)) // older than current
      q.processAllAvailable()
      in.addData(Event(3, ts(3000), 1, "purchase", 5.0))
      q.processAllAvailable()
    } finally quiesceAndStop(q)
    // last update for key 1 must be the ts=3000 purchase; the stale
    // ts=1500 record must never displace the ts=2000 click.
    val updates = spark.table("lpk").as[Latest].collect()
    assert(updates.last.event_type === "purchase")
    assert(!updates.exists(_.event_type === "stale"))
  }

  test("reservation passes orders until stock is exhausted (InventoryService semantics)") {
    // reference: InventoryService.java:132-169
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[OrderLine]
    val res = reservation(in.toDS(), Map(7L -> 10.0))
    val q = res.toDF().writeStream.format("memory").queryName("resv")
      .outputMode("update").start()
    try {
      in.addData(OrderLine(1, 7, 6.0, ts(1000)), OrderLine(2, 7, 5.0, ts(2000)),
        OrderLine(3, 7, 4.0, ts(3000)))
      q.processAllAvailable()
    } finally quiesceAndStop(q)
    val got = spark.table("resv").as[Reservation].collect()
      .sortBy(_.order_id).map(_.result).toSeq
    // 6 fits (6<=10), 5 would exceed (11>10) -> FAIL, 4 fits (10<=10)
    assert(got === Seq("PASS", "FAIL", "PASS"))
  }

  test("streamStaticJoin enriches a stream against a broadcast table (GlobalKTable)") {
    // reference: GlobalKTablesExample.java:183-196
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val customers = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "level")
    val in = MemoryStream[(Long, Long)] // (order_id, customer_id)
    val orders = in.toDF().toDF("order_id", "customer_id")
    val q = streamStaticJoin(orders, customers, "customer_id", "cust_id")
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    try {
      in.addData((100L, 1L), (101L, 2L), (102L, 3L)) // 3L: no such customer
      q.processAllAvailable()
    } finally quiesceAndStop(q)
    val got = spark.table("ssjoin").selectExpr("order_id", "level").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(100L -> "gold", 101L -> "silver"))
  }

  test("topN recomputes the chart from a latest view (KafkaMusic top-five semantics)") {
    // reference: KafkaMusicExample.java:455-498 (plays desc, id asc)
    import spark.implicits._
    val latest = Seq(("punk", 1L, 5.0), ("punk", 2L, 9.0), ("punk", 3L, 9.0),
      ("rock", 4L, 2.0)).toDF("genre", "song_id", "plays")
    val got = topN(latest, "genre", "plays", "song_id", 2)
      .select("genre", "pos", "song_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === Set(("punk", 1, 2L), ("punk", 2, 3L), ("rock", 1, 4L)))
  }

  test("regroup count changelog emits add/subtract deltas and the HAVING tombstone (UserRegion golden)") {
    // reference: UserRegionLambdaExample.java:72-106 — the javadoc's exact
    // input sequence (alice moves asia→europe at offset 4) and the
    // `count >= 2` filtered changelog it produces. Each update is its own
    // micro-batch; the delta stream between the two stateful stages is the
    // reference's repartition topic (Spark disallows two update-mode
    // stateful operators in one query, like Streams repartitions between
    // the groupBy and the count).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val updates = Seq(
      UserRegion("alice", Some("asia"), 0), UserRegion("bob", Some("americas"), 1),
      UserRegion("chao", Some("asia"), 2), UserRegion("dave", Some("europe"), 3),
      UserRegion("alice", Some("europe"), 4), UserRegion("eve", Some("americas"), 5),
      UserRegion("fang", Some("asia"), 6), UserRegion("gandalf", Some("europe"), 7))

    val in = MemoryStream[UserRegion]
    val q1 = regroupDeltas(in.toDS()).writeStream.format("memory")
      .queryName("deltas").outputMode("update").start()
    try {
      updates.foreach { u => in.addData(u); q1.processAllAvailable() }
    } finally quiesceAndStop(q1)
    val deltas = spark.table("deltas").as[RegionDelta].collect().sortBy(_.ord)
    // alice's move is the subtractor/adder pair at ord 4
    assert(deltas.filter(_.ord == 4).toList ===
      List(RegionDelta("asia", -1, 4), RegionDelta("europe", 1, 4)))
    assert(deltas.length === 9) // 8 adds + 1 subtract

    val in2 = MemoryStream[RegionDelta]
    val q2 = regroupCountChangelog(in2.toDS()).writeStream.format("memory")
      .queryName("counts").outputMode("update").start()
    try {
      // one micro-batch per original update offset, like the repartition
      // topic consumed in arrival order
      deltas.groupBy(_.ord).toSeq.sortBy(_._1).foreach { case (_, ds) =>
        in2.addData(ds.toSeq); q2.processAllAvailable()
      }
    } finally quiesceAndStop(q2)
    val got = spark.table("counts").as[RegionCount].collect()
      .sortBy(r => (r.ord, r.region)).toList
    assert(got === List(
      RegionCount("asia", Some(2), 2),      // chao joins alice
      RegionCount("asia", None, 4),         // alice leaves: drops below 2
      RegionCount("europe", Some(2), 4),    // ...and joins dave
      RegionCount("americas", Some(2), 5),  // eve joins bob
      RegionCount("asia", Some(2), 6),      // fang re-fills asia
      RegionCount("europe", Some(3), 7)))   // gandalf
  }

  test("nearDupDropStream: first wins, cross-batch drop, cap eviction forgets") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = graft.ops.Similarity.Dim
    // deterministic geometry against the REAL seeded plane 0 (the op runs
    // with numPlanes=1): u = normalized plane, q ⊥ u. Then a = u + q and
    // c = u − q share the bucket (both have positive u-component → same
    // sign against the plane) while cos(a, c) = 0 — same-bucket NON-dups.
    val p = graft.ops.Similarity.planes(0)
    val pn = math.sqrt(p.map(x => x * x).sum)
    val u = p.map(_ / pn).toSeq
    val e0 = 1.0 +: Seq.fill(dim - 1)(0.0)
    val proj = e0.zip(u).map { case (x, y) => x * y }.sum
    val q0 = e0.zip(u).map { case (x, y) => x - proj * y }
    val qn = math.sqrt(q0.map(x => x * x).sum)
    val q = q0.map(_ / qn)
    val a = u.zip(q).map { case (x, y) => x + y }
    val c = u.zip(q).map { case (x, y) => x - y }
    def ts(s: Int) = new Timestamp(s * 1000L)
    val in = MemoryStream[VecEvent]
    runQuery(nearDupDropStream(in.toDS(), 0.95, maxPerBucket = 1,
        numPlanes = 1).toDF(), "ndd", OutputMode.Update()) {
      in.addData(VecEvent(1, ts(1), a)); qProcess("ndd")
      // batch 2: exact copy of a (cos 1.0, same bucket) drops CROSS-batch;
      // c (same bucket, cos 0) is kept and — cap 1 — EVICTS a
      in.addData(VecEvent(2, ts(2), a), VecEvent(3, ts(3), c)); qProcess("ndd")
      // batch 3: a again — the cap evicted it, so the stream forgets and
      // keeps it anew (the documented size-bound trade); a second copy in
      // the same batch drops against the row kept moments before
      in.addData(VecEvent(4, ts(4), a), VecEvent(5, ts(5), a)); qProcess("ndd")
    }
    val got = spark.table("ndd").as[VecKept].collect()
      .map(k => k.vec_id -> k.n_checked).toMap
    assert(got.keySet === Set(1L, 3L, 4L),
      s"survivors: expected 1,3,4 got ${got.keySet}")
    assert(got(1L) === 0)  // empty bucket on arrival
    assert(got(3L) === 1)  // compared against the kept a
    assert(got(4L) === 1)  // compared against the kept c (a was evicted)
  }

  // processAllAvailable on the active query feeding the named sink
  test("nearDupDropStreamTws matches the fMGWS golden on ListState (RocksDB)") {
    // same plane-orthogonal geometry as the fMGWS golden above; the TWS
    // form's drop path writes no state at all
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dim = graft.ops.Similarity.Dim
      val p = graft.ops.Similarity.planes(0)
      val pn = math.sqrt(p.map(x => x * x).sum)
      val u = p.map(_ / pn).toSeq
      val e0 = 1.0 +: Seq.fill(dim - 1)(0.0)
      val proj = e0.zip(u).map { case (x, y) => x * y }.sum
      val q0 = e0.zip(u).map { case (x, y) => x - proj * y }
      val qn = math.sqrt(q0.map(x => x * x).sum)
      val q = q0.map(_ / qn)
      val a = u.zip(q).map { case (x, y) => x + y }
      val c = u.zip(q).map { case (x, y) => x - y }
      def ts(s: Int) = new Timestamp(s * 1000L)
      val in = MemoryStream[VecEvent]
      runQuery(nearDupDropStreamTws(in.toDS(), 0.95, maxPerBucket = 1,
          numPlanes = 1).toDF(), "nddt", OutputMode.Update()) {
        in.addData(VecEvent(1, ts(1), a)); qProcess("nddt")
        in.addData(VecEvent(2, ts(2), a), VecEvent(3, ts(3), c)); qProcess("nddt")
        in.addData(VecEvent(4, ts(4), a), VecEvent(5, ts(5), a)); qProcess("nddt")
      }
      val got = spark.table("nddt").as[VecKept].collect()
        .map(k => k.vec_id -> k.n_checked).toMap
      assert(got.keySet === Set(1L, 3L, 4L))
      assert(got(1L) === 0 && got(3L) === 1 && got(4L) === 1)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def qProcess(name: String): Unit =
    spark.streams.active.find(_.name == name).foreach(_.processAllAvailable())

  private def withRocksDb(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("substringAttribStream (TWS port #6): first writer owns the span; later docs " +
      "attribute cross-batch; within-batch ts order decides ownership") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val w = (1 to 20).map(i => s"w$i")
    val in = MemoryStream[DocStreamEvent]
    runQuery(substringAttribStream(in.toDS()).toDF(), "ssa", OutputMode.Update()) {
      // batch 1: A (the future owner) + an unrelated doc — no emissions
      in.addData(DocStreamEvent(1L, ts(1000), w.mkString(" ")),
        DocStreamEvent(5L, ts(1001), (1 to 12).map(i => s"z$i").mkString(" ")))
      qProcess("ssa")
      // batch 2: B shares w5..w16 (12 tokens => 5 anchors), C copies A
      // outright (20 tokens => 13 anchors) — both attribute to A
      in.addData(
        DocStreamEvent(2L, ts(2000),
          (Seq("x1", "x2") ++ w.slice(4, 16) ++ Seq("y1", "y2")).mkString(" ")),
        DocStreamEvent(3L, ts(2001), w.mkString(" ")))
      qProcess("ssa")
      // batch 3: two NEW docs sharing a fresh span arrive together — the
      // earlier ts becomes owner, the later attributes within the batch
      val fresh = (1 to 10).map(i => s"f$i")
      in.addData(DocStreamEvent(6L, ts(3000), fresh.mkString(" ")),
        DocStreamEvent(7L, ts(3001), ("pre" +: fresh).mkString(" ")))
      qProcess("ssa")
    }
    val got = spark.table("ssa").as[AnchorMatch].collect()
    val byDoc = got.groupBy(_.doc_id)
    // B: 5 anchor matches, all owned by A, diagonal constant (pa-pb = 2)
    val b = byDoc(2L).sortBy(_.pos)
    assert(b.length === 5 && b.forall(_.owner_doc === 1L))
    assert(b.map(m => m.owner_pos - m.pos).toSet === Set(2))
    assert(b.map(_.pos).toSeq === (2 to 6))
    // C: full copy => 13 matches on the zero diagonal
    val c = byDoc(3L)
    assert(c.length === 13 && c.forall(m => m.owner_doc === 1L && m.owner_pos === m.pos))
    // same-batch: 7 attributes to 6 (3 anchors of the 10-token span)
    val g7 = byDoc(7L)
    assert(g7.length === 3 && g7.forall(_.owner_doc === 6L))
    assert(g7.map(m => m.pos - m.owner_pos).toSet === Set(1)) // "pre" shift
    // owners and the unrelated doc never attribute
    assert(!byDoc.contains(1L) && !byDoc.contains(5L) && !byDoc.contains(6L))
  }}

  test("substringAttribStream saturation cap: a stop-phrase gram goes silent after maxHits") {
    withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val span = (1 to 8).map(i => s"s$i").mkString(" ") // exactly one anchor
    val in = MemoryStream[DocStreamEvent]
    runQuery(substringAttribStream(in.toDS(), maxHits = 2).toDF(), "ssacap",
        OutputMode.Update()) {
      in.addData(DocStreamEvent(1L, ts(1000), span)) // owner
      qProcess("ssacap")
      (2 to 5).foreach { d =>
        in.addData(DocStreamEvent(d.toLong, ts(1000L + d), span))
        qProcess("ssacap")
      }
    }
    val got = spark.table("ssacap").as[AnchorMatch].collect().sortBy(_.doc_id)
    // only the first maxHits non-owner docs attribute; 4 and 5 are silent
    assert(got.map(_.doc_id).toSeq === Seq(2L, 3L))
    assert(got.forall(_.owner_doc === 1L))
    }
  }

  test("invertedIndexStream (TWS port #7): df/tf accumulate cross-batch; head ranks " +
      "tf desc / doc asc; emissions match the batch t19 semantics") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[DocStreamEvent]
    runQuery(invertedIndexStream(in.toDS()).toDF(), "iis", OutputMode.Update()) {
      in.addData(DocStreamEvent(1L, ts(1000), "cat dog cat"),
        DocStreamEvent(2L, ts(1001), "dog cat"))
      qProcess("iis")
      in.addData(DocStreamEvent(3L, ts(2000), "cat fish fish fish"))
      qProcess("iis")
    }
    val rows = spark.table("iis").as[IndexHead].collect()
    // latest emission per term = the rows with that term's max df
    val latest = rows.groupBy(_.term).map { case (t, rs) =>
      t -> rs.filter(_.df == rs.map(_.df).max).sortBy(_.rk)
    }
    // cat after batch 2: df=3, corpus_tf=4, head (1,tf2),(3,tf1),(2,tf1)
    val cat = latest("cat")
    assert(cat.map(h => (h.df, h.corpus_tf)).distinct === List((3L, 4L)))
    assert(cat.map(h => (h.rk, h.doc_id, h.tf)) ===
      List((1, 1L, 2L), (2, 2L, 1L), (3, 3L, 1L)))
    // fish: single doc, tf 3
    assert(latest("fish").map(h => (h.df, h.corpus_tf, h.rk, h.doc_id, h.tf)) ===
      List((1L, 3L, 1, 3L, 3L)))
    // dog saw no batch-2 update: its batch-1 emission is the latest
    assert(latest("dog").map(h => (h.rk, h.doc_id, h.tf)) ===
      List((1, 1L, 1L), (2, 2L, 1L)))
    // batch-1 cat emission had df=2/tf=3 (cross-batch accumulation is real)
    assert(rows.filter(r => r.term == "cat" && r.df == 2L)
      .map(r => r.corpus_tf).distinct.toList === List(3L))
  }}

  test("invertedIndexStream eviction: the capped head keeps the heavy docs, counters stay exact") {
    withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[DocStreamEvent]
    runQuery(invertedIndexStream(in.toDS(), topDocs = 1, margin = 1).toDF(),
        "iiscap", OutputMode.Update()) {
      // doc 1: z x3; doc 2: z x2; doc 3: z x1 -> head cap 2 evicts doc 3
      in.addData(DocStreamEvent(1L, ts(1000), "z z z"))
      qProcess("iiscap")
      in.addData(DocStreamEvent(2L, ts(2000), "z z"))
      qProcess("iiscap")
      in.addData(DocStreamEvent(3L, ts(3000), "z"))
      qProcess("iiscap")
    }
    val rows = spark.table("iiscap").as[IndexHead].collect()
    val last = rows.filter(_.df == 3L)
    // counters exact over ALL postings (6 = 3+2+1) even with eviction
    assert(last.map(h => (h.df, h.corpus_tf)).distinct.toList === List((3L, 6L)))
    // the emitted head (topDocs=1) is the heaviest doc
    assert(last.map(h => (h.rk, h.doc_id, h.tf)).toList === List((1, 1L, 3L)))
  }}

  test("piiScrubFrame runs unchanged as a streaming scrub-on-ingest stage " +
      "(stateless append), output identical to the batch form") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (0L, "mail a.b@x.io and 10.1.2.3"),
      (1L, "clean document, nothing to scrub"),
      (2L, "call 555-123-4567 or card 1234567890123456"))
    val in = MemoryStream[(Long, String)]
    runQuery(graft.ops.TextAnalysis.piiScrubFrame(
        in.toDF().toDF("doc_id", "text")), "pii_stream", OutputMode.Append()) {
      in.addData(rows: _*)
    }
    val got = spark.table("pii_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5))).sortBy(_._1)
    val batch = graft.ops.TextAnalysis.piiScrubFrame(
        rows.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5))).sortBy(_._1)
    assert(got.toSeq === batch.toSeq)
    assert(got.map(_._1).toSeq === Seq(0L, 2L), "clean doc 1 reports nothing")
  }

  test("deltaDedupStream: streamed batch docs get the exact same verdicts " +
      "as the batch d16 against the same standing corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val all = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cut = math.floor(all.length * 0.9).toLong
    // standing-corpus artifacts, prepared batch-side
    val corpusDocs = all.filter(_._1 < cut).toSeq.toDF("doc_id", "text")
    val sig = graft.ops.Dedup.minhashSigFrameOf(corpusDocs)
      .select(col("doc_id").as("c_id"),
        array((0 until graft.ops.Dedup.NumPerms).map(i => col(s"mh$i")): _*)
          .as("c_sig"))
      .localCheckpoint()
    val banded = sig
      .select(col("c_id"), col("c_sig"),
        explode(graft.ops.Dedup.bandBuckets(col("c_sig"))).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("c_id"), col("c_sig"))
      .localCheckpoint()
    val hashes = corpusDocs
      .groupBy(md5(col("text")).as("ch"))
      .agg(min(col("doc_id")).as("exact_partner"))
      .localCheckpoint()
    // stream the batch side through the ingest pipeline
    val in = MemoryStream[StreamOps.DocStreamEvent]
    runQuery(StreamOps.deltaDedupStream(in.toDS(), banded, hashes),
        "delta_stream", OutputMode.Update()) {
      in.addData(all.filter(_._1 >= cut)
        .map { case (id, t) => StreamOps.DocStreamEvent(id, ts(id * 10), t) }
        .toIndexedSeq: _*)
    }
    val got = spark.table("delta_stream").collect()
      .map { r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))) }.toMap
    val batch = graft.ops.Dedup.deltaDedup(spark, dir).collect()
      .map { r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))) }.toMap
    assert(got === batch, "stream verdicts must equal the batch d16 verdicts")
    assert(batch.values.exists(_._1 == "near") || batch.values.exists(_._1 == "exact"),
      "corpus must contain at least one real dup so the parity is non-vacuous")
  }

  test("cellAssignStream: streamed batch vectors get the exact same (cell, sim) " +
      "assignments as batch s20 against the same frozen coarse index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val n = graft.Tables.embeddingsRowCount(spark, dir)
    val cut = math.floor(n * 0.9).toLong
    val stride = math.max(1, math.sqrt(cut.toDouble).toInt)
    val embAll = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        graft.ops.Similarity.l2norm(col("embedding")).as("norm"))
    val (batchAssigned, _, cents) = graft.ops.Similarity.deltaAssignParts(
      embAll.filter(col("vec_id") < cut),
      embAll.filter(col("vec_id") >= cut), stride)
    val expected = batchAssigned.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // the frozen index side is checkpointed once (the artifact a serving
    // or ingest job loads); the batch vectors stream through
    val centsCk = cents.localCheckpoint()
    val batchVecs = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= cut)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val in = MemoryStream[StreamOps.VecEvent]
    runQuery(StreamOps.cellAssignStream(in.toDS(), centsCk), "cell_assign",
        OutputMode.Update()) {
      in.addData(batchVecs.map { case (id, e) =>
        StreamOps.VecEvent(id, ts(id * 10), e) }.toIndexedSeq: _*)
    }
    val got = spark.table("cell_assign").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, row) =>
      assert(row === expected(id), s"stream/batch assignment divergence at vec $id")
    }
    assert(expected.values.map(_._1).toSet.size > 1,
      "non-vacuous: the batch must spread across multiple cells")
  }

  test("lmQualityStream: streamed corpus docs score IDENTICALLY to batch t27 " +
      "against the frozen LM; wholly-OOV text backs off to 1/V — finite, not a crash") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val lm = graft.ops.TextAnalysis.lmModel(docs)
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[StreamOps.DocStreamEvent]
    runQuery(StreamOps.lmQualityStream(in.toDS(), lm), "lm_gate_stream",
        OutputMode.Update()) {
      in.addData(all.map { case (id, t) =>
        StreamOps.DocStreamEvent(id, ts(id * 10), t) }.toIndexedSeq: _*)
      // one wholly-novel document: every bigram AND every context word
      // is unseen in the frozen model — the 1/V back-off path
      in.addData(StreamOps.DocStreamEvent(999999L, ts(9999990L),
        "zzqx wvut zzqx wvut"))
    }
    val got = spark.table("lm_gate_stream").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3))))
      .toMap
    val batch = graft.ops.TextAnalysis.lmQualityFrame(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3))))
      .toMap
    batch.foreach { case (id, row) =>
      assert(got(id) === row, s"stream/batch LM-gate divergence at doc $id")
    }
    assert(batch.nonEmpty && batch.values.exists(_._3 == 1) &&
      batch.values.exists(_._3 == 0),
      "non-vacuous: the corpus must contain both keeps and drops")
    // the OOV doc: 3 bigrams, each at the α/(α·V) = 1/V floor, so
    // ppl = round(exp(-round(ln(1/V)·1e6)/1e6), 6) exactly
    val v = lm.v.head.getDouble(0)
    val lpm = math.round(math.log(
      graft.ops.TextAnalysis.LmAlpha / (v * graft.ops.TextAnalysis.LmAlpha)) * 1e6)
    val expectPpl = BigDecimal(math.exp(-lpm.toDouble / 1e6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (nOov, pplOov, _) = got(999999L)
    assert(nOov === 3L)
    assert(pplOov === expectPpl,
      f"OOV back-off must be the 1/V floor: got $pplOov vs $expectPpl (V=$v)")
  }

  test("secureOptions maps the SecureKafkaStreamsExample client properties to kafka.-prefixed keys") {
    // SecureKafkaStreamsExample.java:166-171 sets security.protocol +
    // the four SSL store/key properties; Spark's connector takes the
    // same names under the kafka. prefix. Pin the mapping and the
    // empty-value filtering (unset properties must not reach the client).
    val opts = Sources.secureOptions(protocol = "SSL",
      truststoreLocation = "/ts.jks", truststorePassword = "tsp",
      keystoreLocation = "/ks.jks", keystorePassword = "ksp",
      keyPassword = "kp")
    assert(opts === Map(
      "kafka.security.protocol" -> "SSL",
      "kafka.ssl.truststore.location" -> "/ts.jks",
      "kafka.ssl.truststore.password" -> "tsp",
      "kafka.ssl.keystore.location" -> "/ks.jks",
      "kafka.ssl.keystore.password" -> "ksp",
      "kafka.ssl.key.password" -> "kp"))
    val sasl = Sources.secureOptions(protocol = "SASL_SSL",
      saslJaasConfig = "org.apache.kafka.common.security.plain.PlainLoginModule required;",
      saslMechanism = "PLAIN")
    assert(sasl.keySet === Set("kafka.security.protocol",
      "kafka.sasl.jaas.config", "kafka.sasl.mechanism"))
  }

  test("mixtureGateStream: streamed docs get the exact t30 keep decisions " +
      "against the frozen rates artifact — per-source counts equal the batch " +
      "sampler's, per-doc flags equal the md5-bucket rule, unknown source drops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // the frozen artifact: the TOTALS-grain rates (one row per source —
    // a source with an empty sampled keep-set still has its budget
    // here, which the kept-rollup would lose)
    val docsDf = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val rates = graft.ops.TextAnalysis.alphaRatesFrame(
      docsDf, graft.ops.TextAnalysis.MixtureAlpha).localCheckpoint()
    assert(rates.count() ===
      docsDf.select(col("source")).distinct().count(),
      "the rates artifact must cover EVERY source, kept or not")
    val ratePpm = rates.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val batchKept = graft.ops.TextAnalysis.alphaMixture(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val in = MemoryStream[StreamOps.SourcedDocEvent]
    runQuery(StreamOps.mixtureGateStream(in.toDS(), rates), "mixture_gate",
        OutputMode.Append()) {
      in.addData(all.map { case (id, src, t) =>
        StreamOps.SourcedDocEvent(id, ts(id * 10), src, t) }.toIndexedSeq: _*)
      // a source the frozen rates have never seen: ingest-safe drop
      in.addData(StreamOps.SourcedDocEvent(999999L, ts(9999990L),
        "brand-new-source", "some text"))
    }
    val got = spark.table("mixture_gate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.length === all.length + 1, "every event decided exactly once")
    // per-doc parity with the md5-bucket rule, computed independently
    val textOf = all.map(r => r._1 -> r._3).toMap
    got.filter(_._1 != 999999L).foreach { case (id, src, keep) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(textOf(id).getBytes("UTF-8")).take(2)
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex, 16)
      val expected = ratePpm.get(src)
        .exists(r => bucket * 1000000L < r * 65536L)
      assert(keep === expected, s"doc $id ($src): bucket $bucket")
    }
    // per-source kept counts equal the batch sampler's n_kept
    val streamKept = got.filter(_._3).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(streamKept === batchKept.filter(_._2 > 0),
      "stream keep counts must equal batch t30 per source")
    // the unseen source is dropped, not crashed and not admitted
    assert(got.find(_._1 == 999999L).exists(_._3 === false))
  }
}
