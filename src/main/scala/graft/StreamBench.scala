package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps

/** Streaming-throughput benchmark: measures sustained rows/sec through the
  * engine's Structured Streaming operators — the measured counterpart of the
  * batch `Bench`, converting the streaming perf story from "goldens pass"
  * to observed numbers.
  *
  * Method: each pipeline reads the deterministic `rate-micro-batch` source
  * (exactly `rowsPerBatch` rows per micro-batch, event time advancing 1 s
  * of per batch — so watermarks fire and state is bounded exactly as in
  * production), runs the REAL `StreamOps` operator under test, and lands in
  * the `noop` sink (full materialization, no I/O). Timing starts when batch
  * 0 completes (query/state-store init and codegen are startup, not
  * throughput) and stops after `batches` further batches; rows counted are
  * the exact `numInputRows` sums from the query progress events in that
  * span, so two-source pipelines (stream-stream join) count both sides.
  *
  * The reference publishes no throughput numbers (BASELINE.md); its demo
  * drivers produce ~10 events/sec (KafkaMusicExampleDriver.java:117,
  * `Thread.sleep(100L)` per event). These measurements are recorded in
  * BASELINE.md's streaming section for cross-round comparison.
  *
  * Output: ONE JSON line —
  * `{"metric":"stream_throughput","value":<total rows/sec>,"unit":
  * "rows/sec","pipelines":{name:{"rows":..,"sec":..,"rps":..}},...}`.
  * Knobs: SPARK_GRAFT_STREAM_ROWS (rows/batch, default 500000),
  * SPARK_GRAFT_STREAM_BATCHES (measured batches, default 8),
  * SPARK_GRAFT_STREAM_PIPELINES (comma-filter), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_STREAM_SHUFFLE (state-partition count at query start).
  * A pipeline that errors is recorded in `errors`, never timed; like
  * `Bench`, a nonempty `errors` exits nonzero.
  */
object StreamBench {

  private def load1: Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** One measured pipeline: stream DataFrame + the output mode it needs. */
  private final case class Pipeline(df: DataFrame, mode: OutputMode)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rowsPerBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "500000").toLong
    val batches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "8").toInt
    val maxSecPerPipeline =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_MAX_SEC", "180").toDouble
    val only = sys.env.get("SPARK_GRAFT_STREAM_PIPELINES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // The default HDFS-backed state store holds all state in executor
    // heap: an interval join buffering millions of rows per side OOMs it
    // (measured: 2M rows/batch/side × a 10 s watermark window exceeds 8 g).
    // SPARK_GRAFT_STREAM_ROCKSDB=true runs every stateful pipeline on the
    // RocksDB provider — the off-heap store a production deployment uses
    // for state that outgrows memory.
    val useRocksDb =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_ROCKSDB", "false").toBoolean
    // SPARK_GRAFT_STREAM_SHUFFLE: state-partition count for the stateful
    // pipelines. A streaming query fixes its state partitioning at the
    // FIRST checkpoint (spark.sql.shuffle.partitions at query start);
    // every pipeline here starts from a fresh checkpoint, so setting the
    // conf before start is exactly the production knob. Per-micro-batch
    // commit overhead is linear in this count while per-row work is not —
    // the round-9 sweep that pins the rule lives in BASELINE.md.
    val shufflePartitions =
      sys.env.get("SPARK_GRAFT_STREAM_SHUFFLE").map(_.toInt)
    // var, not val: a pipeline that OOMs the JVM-shared executor threads
    // can take the whole SparkContext down with it — the harness detects
    // the dead context and rebuilds the session so one pipeline's crash
    // never voids the remaining measurements.
    var spark = GraftSession.local(cpus)
    shufflePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))
    val loadStart = load1
    val calibStart = Calib.runRounded(spark)

    /** Deterministic unbounded source: `value` is a global row index
      * (continues across batches), `timestamp` advances 1 s of event time
      * per batch — watermark-driven state cleanup runs at its real cadence. */
    def rate(): DataFrame = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("numPartitions", cpus)
      .option("startTimestamp", 0L)
      .option("advanceMillisPerBatch", 1000L)
      .load()

    val v = col("value")
    def events(): org.apache.spark.sql.Dataset[StreamOps.Event] = rate()
      .select(v.as("event_id"), col("timestamp").as("ts"),
        (v % 1000).as("user_id"), lit("page_view").as("event_type"),
        (v % 97).cast("double").as("value"))
      .as(org.apache.spark.sql.Encoders.product[StreamOps.Event])

    // Each thunk builds its pipeline lazily so a construction-time error is
    // caught per-pipeline. Key cardinalities: 1000 grouping keys (state
    // updates dominate), 100k-row broadcast dim, 1:1 stream-stream matches
    // (throughput of the join machinery, not an output explosion).
    val pipelines: Seq[(String, () => Pipeline)] = Seq(
      "passthrough" -> (() => Pipeline(
        rate().select(v.as("event_id"), (v % 1000).as("user_id"),
          col("timestamp")),
        OutputMode.Append())),
      "wordcount" -> (() => Pipeline(
        StreamOps.wordCount(rate().select(concat_ws(" ",
          concat(lit("w"), v % 97), concat(lit("w"), (v + 13) % 89),
          concat(lit("w"), (v + 29) % 83)).as("value"))),
        OutputMode.Update())),
      "dedup_ttl" -> (() => Pipeline(
        StreamOps.dedupWithTTL(
          rate().select((v % (math.max(rowsPerBatch, 2L) / 2)).as("event_id"),
            col("timestamp").as("ts"), v.as("payload")),
          "event_id", "ts", "5 seconds"),
        OutputMode.Append())),
      // the same dedup workload on the TWS processor (per-id ValueState +
      // native TTL, RocksDB) — measures the Processor-API port against the
      // built-in dropDuplicatesWithinWatermark form above
      "dedup_ttl_tws" -> (() => Pipeline(
        StreamOps.dedupWithTTLTws(
          rate().select((v % (math.max(rowsPerBatch, 2L) / 2)).as("event_id"),
            col("timestamp").as("ts"), v.as("payload"))
            .as(org.apache.spark.sql.Encoders.product[StreamOps.IdEvent]),
          java.time.Duration.ofSeconds(5)).toDF(),
        OutputMode.Append())),
      "tumbling_counts" -> (() => Pipeline(
        StreamOps.tumblingCounts(
          rate().select(col("timestamp").as("ts"), (v % 1000).as("k")),
          "ts", "k", "10 seconds", "5 seconds"),
        OutputMode.Update())),
      // Session windows stream only in append mode (emit on close), so the
      // key space rotates every 3 event-time seconds: a generation's keys
      // go silent, the 5 s gap elapses, and its sessions close and emit —
      // the state-merge AND emission paths are both exercised.
      "session_counts" -> (() => Pipeline(
        StreamOps.sessionCounts(
          rate().select(col("timestamp").as("ts"),
            ((v % 1000) + lit(1000L) *
              floor(unix_timestamp(col("timestamp")) / 3)).as("k")),
          "ts", "k", "5 seconds", "5 seconds"),
        OutputMode.Append())),
      // the same rotating-key session workload on the TWS timer port
      // (port #5): explicit open-session ListState + one event-time close
      // timer per session, vs the native session_window store above
      "session_counts_tws" -> (() => Pipeline(
        StreamOps.sessionCountsTws(
          rate().select(v.as("event_id"), col("timestamp").as("ts"),
            ((v % 1000) + lit(1000L) *
              floor(unix_timestamp(col("timestamp")) / 3)).cast("long").as("user_id"),
            lit("s").as("event_type"), lit(1.0).as("value"))
            .as(org.apache.spark.sql.Encoders.product[StreamOps.Event]),
          5000L, "5 seconds").toDF(),
        OutputMode.Append())),
      "stream_static_join" -> (() => Pipeline(
        StreamOps.streamStaticJoin(
          rate().select(v.as("event_id"), (v % 100000).as("k")),
          spark.range(100000).select(col("id").as("d_k"),
            (col("id") % 7).as("d_region")),
          "k", "d_k"),
        OutputMode.Append())),
      "stream_stream_join" -> (() => Pipeline(
        StreamOps.windowedJoin(
          rate().select(v.as("k"), col("timestamp").as("ts"), v.as("value")),
          rate().select(v.as("k"), col("timestamp").as("ts"), v.as("value")),
          "k", "10 seconds"),
        OutputMode.Append())),
      "running_count_fmgws" -> (() => Pipeline(
        StreamOps.runningCount(events()).toDF(),
        OutputMode.Update())),
      "running_count_tws" -> (() => Pipeline(
        StreamOps.runningCountTws(events()).toDF(),
        OutputMode.Update())),
      "latest_per_key" -> (() => Pipeline(
        StreamOps.latestPerKey(events()).toDF(),
        OutputMode.Update())),
      // streaming semantic dedup: deterministic 64-dim embeddings derived
      // from vec_id = value % 250000 — the default 500k-row batch covers
      // the id space twice and later batches repeat it entirely, so the
      // steady state is ~100% duplicates: this measures the DROP path
      // (kept-list lookup + bucket-local cosine) at saturation, with the
      // default 8-plane SRP bucketing
      "neardup_drop" -> (() => Pipeline(
        StreamOps.nearDupDropStream(
          rate().select((v % 250000).as("vec_id"), col("timestamp").as("ts"),
            transform(sequence(lit(0), lit(63)),
              i => sin((v % 250000) * 0.7 + i * 1.3)).as("embedding"))
            .as(org.apache.spark.sql.Encoders.product[StreamOps.VecEvent]),
          0.95).toDF(),
        OutputMode.Update())),
      // same saturation workload on the TWS ListState port: the drop path
      // (≈100% of steady-state rows here) writes NO state at all
      "neardup_drop_tws" -> (() => Pipeline(
        StreamOps.nearDupDropStreamTws(
          rate().select((v % 250000).as("vec_id"), col("timestamp").as("ts"),
            transform(sequence(lit(0), lit(63)),
              i => sin((v % 250000) * 0.7 + i * 1.3)).as("embedding"))
            .as(org.apache.spark.sql.Encoders.product[StreamOps.VecEvent]),
          0.95).toDF(),
        OutputMode.Update())),
      // the KafkaMusic chart path: changelog updates (with ~2% tombstones)
      // into the capped per-group top-N state
      "incremental_topn" -> (() => Pipeline(
        StreamOps.incrementalTopN(
          rate().select(concat(lit("g"), v % 20).as("group"),
            (v % 500).as("id"),
            when(v % 50 === 0, lit(null).cast("double"))
              .otherwise((v % 997).cast("double")).as("value"))
            .as(org.apache.spark.sql.Encoders.product[StreamOps.ChangelogEntry]),
          5).toDF(),
        OutputMode.Update())),
      // same chart workload on the TWS MapState port: per-member point
      // writes instead of whole-membership blob rewrites per batch
      "incremental_topn_tws" -> (() => Pipeline(
        StreamOps.incrementalTopNTws(
          rate().select(concat(lit("g"), v % 20).as("group"),
            (v % 500).as("id"),
            when(v % 50 === 0, lit(null).cast("double"))
              .otherwise((v % 997).cast("double")).as("value"))
            .as(org.apache.spark.sql.Encoders.product[StreamOps.ChangelogEntry]),
          5).toDF(),
        OutputMode.Update())),
      // streaming exact-substring attribution (TWS port #6): 12-token docs
      // drawn from 10k span templates → 5 anchors/doc over 50k gram keys;
      // every template repeats ~50× per batch, so after the first batch
      // nearly every gram is owner-known and hit-capped — the steady state
      // measures the saturated read-only path (state get, no write, no
      // emission), the crawl-stream regime the operator is built for
      // streaming PII scrub: the t26 redaction chain applied in-flight —
      // pure stateless column work (4 regexp counts + the nested replace
      // chain per row), the shape of a scrub-on-ingest pipeline; every
      // synthetic row carries an email + ip + phone so the regex engine
      // does real work on each document
      "pii_scrub" -> (() => Pipeline(
        graft.ops.TextAnalysis.piiScrubFrame(
          rate().select(v.as("doc_id"), concat(
            lit("the quick brown fox mailed u"), v, lit("@ex"), v % 10,
            lit(".org from 10."), v % 200, lit("."), v % 250, lit("."),
            v % 100 + 1, lit(" tel 555-"),
            lpad((v % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((v % 10000).cast("string"), 4, "0")).as("text"))),
        OutputMode.Append())),
      // streaming delta dedup: ingest docs verdict-checked against a
      // 50k-doc standing corpus (banded signatures + content hashes
      // prepared once at build — the Artifacts read path); stream text
      // reuses the corpus formula so the exact tier does real matching
      "delta_dedup_stream" -> (() => {
        def textOf(id: org.apache.spark.sql.Column) = concat_ws(" ",
          (0 until 12).map(i =>
            concat(lit(('a' + i).toChar.toString), (id + i * 37) % 5000)): _*)
        val corpusDocs = spark.range(50000)
          .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
        val sig = graft.ops.Dedup.minhashSigFrameOf(corpusDocs)
          .select(col("doc_id").as("c_id"),
            array((0 until graft.ops.Dedup.NumPerms)
              .map(i => col(s"mh$i")): _*).as("c_sig"))
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
        Pipeline(
          StreamOps.deltaDedupStream(
            rate().select(v.as("doc_id"), col("timestamp").as("ts"),
              textOf(v).as("text"))
              .as(org.apache.spark.sql.Encoders.product[StreamOps.DocStreamEvent]),
            banded, hashes),
          OutputMode.Update())
      }),
      // streaming index assignment: ingest vectors assigned to their
      // nearest cell of a frozen 256-centroid coarse index (64-dim) —
      // the honest batch×C scoring shape with the per-vector argmax as
      // the only state; embeddings synthesized per-row from the id
      "cell_assign_stream" -> (() => {
        val cents = spark.range(256)
          .select(col("id").as("cent_id"),
            transform(sequence(lit(0), lit(63)),
              i => sin(col("id") * 0.37 + i * 0.11)).as("c_emb"))
          .withColumn("c_norm", graft.ops.Similarity.l2norm(col("c_emb")))
          .localCheckpoint()
        Pipeline(
          StreamOps.cellAssignStream(
            rate().select(v.as("vec_id"), col("timestamp").as("ts"),
              transform(sequence(lit(0), lit(63)),
                i => sin(v * 1.7 + i * 0.13)).as("embedding"))
              .as(org.apache.spark.sql.Encoders.product[StreamOps.VecEvent]),
            cents),
          OutputMode.Update())
      }),
      // streaming LM-quality gate: ingest docs scored against a frozen
      // 50k-doc corpus bigram LM (vocabulary-bounded count tables
      // prepared once at build — the Artifacts read path); stream text
      // reuses the corpus formula so every probe joins real counts, and
      // a v%7 token substitution exercises the OOV back-off branch
      "lm_quality_gate" -> (() => {
        def textOf(id: org.apache.spark.sql.Column) = concat_ws(" ",
          (0 until 12).map(i =>
            concat(lit(('a' + i).toChar.toString), (id + i * 37) % 5000)): _*)
        val lm = graft.ops.TextAnalysis.lmModel(
          spark.range(50000)
            .select(col("id").as("doc_id"), textOf(col("id")).as("text")))
        Pipeline(
          StreamOps.lmQualityStream(
            rate().select(v.as("doc_id"), col("timestamp").as("ts"),
              when(v % 7 === 0, concat(lit("zznovel"), v, lit(" "), textOf(v)))
                .otherwise(textOf(v)).as("text"))
              .as(org.apache.spark.sql.Encoders.product[StreamOps.DocStreamEvent]),
            lm),
          OutputMode.Update())
      }),
      // streaming mixture gate: t30's keep decision at ingest — one
      // in-row md5 projection + a stream-static broadcast join against
      // the frozen source-grain rates (built once from a 50k-doc batch)
      "mixture_gate" -> (() => {
        def textOf(id: org.apache.spark.sql.Column) = concat_ws(" ",
          (0 until 12).map(i =>
            concat(lit(('a' + i).toChar.toString), (id + i * 37) % 5000)): _*)
        val rates = graft.ops.TextAnalysis.alphaRatesFrame(
          spark.range(50000).select(col("id").as("doc_id"),
            concat(lit("s"), col("id") % 20).as("source"),
            textOf(col("id")).as("text")),
          graft.ops.TextAnalysis.MixtureAlpha).localCheckpoint()
        Pipeline(
          StreamOps.mixtureGateStream(
            rate().select(v.as("doc_id"), col("timestamp").as("ts"),
              concat(lit("s"), v % 20).as("source"), textOf(v).as("text"))
              .as(org.apache.spark.sql.Encoders.product[StreamOps.SourcedDocEvent]),
            rates),
          OutputMode.Append())
      }),
      "substring_attrib_tws" -> (() => Pipeline(
        StreamOps.substringAttribStream(
          rate().select(v.as("doc_id"), col("timestamp").as("ts"),
            concat_ws(" ", (0 until 12).map(i =>
              concat(lit(('a' + i).toChar.toString), v % 10000)): _*).as("text"))
            .as(org.apache.spark.sql.Encoders.product[StreamOps.DocStreamEvent])).toDF(),
        OutputMode.Update())),
      // streaming inverted-index maintenance (TWS port #7): 12-token docs
      // over a ~60k-term vocabulary (12 tokens/doc → ~12 term-state
      // touches per doc: a ValueState counter bump + a MapState point put
      // each, plus the bounded head re-rank) — the live-index crawl
      // regime t19 serves in batch
      "inverted_index_tws" -> (() => Pipeline(
        StreamOps.invertedIndexStream(
          rate().select(v.as("doc_id"), col("timestamp").as("ts"),
            concat_ws(" ", (0 until 12).map(i =>
              concat(lit(('a' + i).toChar.toString), (v + i * 37) % 5000)): _*).as("text"))
            .as(org.apache.spark.sql.Encoders.product[StreamOps.DocStreamEvent])).toDF(),
        OutputMode.Update())))

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Double)]

    pipelines.filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, build) =>
        // a pipeline crash (e.g. state-store OOM) can stop the shared
        // local SparkContext — rebuild so the remaining pipelines still
        // measure instead of cascading "no active session" errors
        if (spark.sparkContext.isStopped) {
          org.apache.spark.sql.SparkSession.clearActiveSession()
          org.apache.spark.sql.SparkSession.clearDefaultSession()
          spark = GraftSession.local(cpus)
          shufflePartitions.foreach(n =>
            spark.conf.set("spark.sql.shuffle.partitions", n))
        }
        // transformWithState requires the RocksDB provider; everything
        // else defaults to the in-heap HDFS-backed store unless
        // SPARK_GRAFT_STREAM_ROCKSDB asks for RocksDB suite-wide.
        val tws = name.endsWith("_tws") || useRocksDb
        val prevProvider =
          spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        if (tws) spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val ckpt = Files.createTempDirectory(s"graft-sb-$name").toString
        try {
          val p = build()
          val q = p.df.writeStream.format("noop").outputMode(p.mode)
            .option("checkpointLocation", ckpt).start()
          try {
            val deadline = System.nanoTime() + (maxSecPerPipeline * 1e9).toLong
            def lastBatch: Long =
              Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
            while (lastBatch < 0 && System.nanoTime() < deadline) {
              q.exception.foreach(throw _); Thread.sleep(20)
            }
            val b0 = lastBatch
            val t0 = System.nanoTime()
            while (lastBatch < b0 + batches && System.nanoTime() < deadline) {
              q.exception.foreach(throw _); Thread.sleep(20)
            }
            val t1 = System.nanoTime()
            val b1 = lastBatch
            q.stop()
            if (b0 < 0 || b1 <= b0)
              errors(name) = s"no progress within ${maxSecPerPipeline}s"
            else {
              // exact input-row count over the measured span from the
              // progress events (counts BOTH sides of a two-source join)
              val rows = q.recentProgress
                .filter(pr => pr.batchId > b0 && pr.batchId <= b1)
                .map(_.numInputRows).sum
              results(name) = (rows, (t1 - t0) / 1e9)
            }
          } finally { if (q.isActive) q.stop() }
        } catch { case e: Throwable =>
          errors(name) = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage)).take(160)
            .map(c => if (c == '"' || c == '\\' || c < ' ') ' ' else c)
        } finally {
          if (tws) prevProvider match {
            case Some(pv) => spark.conf
              .set("spark.sql.streaming.stateStore.providerClass", pv)
            case None => spark.conf
              .unset("spark.sql.streaming.stateStore.providerClass")
          }
        }
      }

    val totalRows = results.values.map(_._1).sum
    val totalSec = results.values.map(_._2).sum
    // closing-window discipline (VERDICT r18 wrong #1, applied fleet-wide):
    // both probes in the JSON, both gate the warning and the exit
    val calibEnd = Calib.runRounded(spark)
    val loadEnd = load1
    val pipeJson = results.map { case (n, (rows, sec)) =>
      f""""$n":{"rows":$rows,"sec":$sec%.3f,"rps":${rows / math.max(sec, 1e-9)}%.0f}"""
    }.mkString(",")
    val errJson = errors.map { case (n, m) => s""""$n":"$m"""" }.mkString(",")
    println(
      f"""{"metric":"stream_throughput","value":${totalRows / math.max(totalSec, 1e-9)}%.0f,"unit":"rows/sec","rows_per_batch":$rowsPerBatch,"batches":$batches,"rocksdb":$useRocksDb,"shuffle_partitions":${shufflePartitions.getOrElse(cpus)},"pipelines":{$pipeJson},"errors":{$errJson},"calib_sec":$calibStart,"calib_sec_end":$calibEnd,"calib_warning":${Calib.warning(calibStart, calibEnd)},"load1_start":$loadStart%.2f,"load1_end":$loadEnd%.2f,"load_warning":${loadStart > 4 || loadEnd > 12}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
    Calib.enforce(calibStart, calibEnd)
  }
}
