package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Source/sink wiring (SURVEY.md §2.1, S1–S10).
  *
  * The Kafka connector jar isn't present in this environment, so the
  * Kafka paths are thin, untested-here wrappers over the standard
  * `format("kafka")` options; everything downstream of the source is
  * source-agnostic (see StreamOps) and is tested via MemoryStream.
  */
object Sources {

  /** Security config pass-through (SecureKafkaStreamsExample.java:166-171
    * parity): the reference sets SSL/SASL client properties on its
    * StreamsConfig; Spark's Kafka connector takes the SAME client
    * property names prefixed with `kafka.`. This helper builds that
    * option map; thread it through `extraOptions` on any reader/writer
    * below. Untestable without a broker (the connector jar and a secured
    * listener are absent here); the spec pins the exact key names so the
    * mapping can't drift. */
  def secureOptions(protocol: String = "SSL",
      truststoreLocation: String = "", truststorePassword: String = "",
      keystoreLocation: String = "", keystorePassword: String = "",
      keyPassword: String = "", saslJaasConfig: String = "",
      saslMechanism: String = ""): Map[String, String] =
    (Map("kafka.security.protocol" -> protocol,
      "kafka.ssl.truststore.location" -> truststoreLocation,
      "kafka.ssl.truststore.password" -> truststorePassword,
      "kafka.ssl.keystore.location" -> keystoreLocation,
      "kafka.ssl.keystore.password" -> keystorePassword,
      "kafka.ssl.key.password" -> keyPassword,
      "kafka.sasl.jaas.config" -> saslJaasConfig,
      "kafka.sasl.mechanism" -> saslMechanism)
      .filter { case (_, v) => v.nonEmpty })

  /** S1 `builder.stream(topic)`: topic → streaming DataFrame with string
    * key/value columns (the shape every reference topology starts from).
    * `extraOptions`: additional `kafka.`-prefixed client properties —
    * [[secureOptions]] for SSL/SASL, or any other consumer override. */
  def readTopic(spark: SparkSession, brokers: String, topic: String,
      fromBeginning: Boolean = false,
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", if (fromBeginning) "earliest" else "latest")
      .options(extraOptions)
      .load()
      .select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("timestamp").as("ts"))

  /** S5 `stream.to(topic)`: fixed-topic sink. */
  def writeTopic(df: DataFrame, brokers: String, topic: String,
      checkpoint: String,
      extraOptions: Map[String, String] = Map.empty): DataStreamWriter[Row] =
    df.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .options(extraOptions)

  /** S6 dynamic routing (`TopicNameExtractor`, EmailService.java:114-116):
    * the Kafka sink honors a per-row `topic` column — no fixed topic
    * option. Batch analog: `df.write.partitionBy(topicCol)`. */
  def writeRouted(df: DataFrame, brokers: String, topicCol: String,
      checkpoint: String,
      extraOptions: Map[String, String] = Map.empty): DataStreamWriter[Row] =
    df.withColumn("topic", col(topicCol))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("checkpointLocation", checkpoint)
      .options(extraOptions)

  /** S1 over the offline log: same shape as [[readTopic]] but against the
    * `graftlog` DSv2 source (graft.sources.GraftLog) — partitioned,
    * offset-resumable, provable without a broker. Swapping in
    * `format("kafka")` is the only change on a real cluster. */
  def readLog(spark: SparkSession, topicDir: String,
      fromBeginning: Boolean = true): DataFrame =
    spark.readStream.format("graftlog")
      .option("startingOffsets", if (fromBeginning) "earliest" else "latest")
      .load(topicDir)
      // the log carries BYTES (Kafka parity); the string cast here is the
      // exact readTopic/Kafka idiom — binary serdes read `value` raw
      .select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"), col("ts"))

  /** S1 raw: the log's native (key, value, ts) with key/value as BYTES —
    * for typed serdes (AvroCodec wire framing) that decode downstream;
    * [[readLog]] is the string-cast convenience over the same scan. */
  def readLogBytes(spark: SparkSession, topicDir: String,
      fromBeginning: Boolean = true): DataFrame =
    spark.readStream.format("graftlog")
      .option("startingOffsets", if (fromBeginning) "earliest" else "latest")
      .load(topicDir)
      .select(col("key"), col("value"), col("ts"))

  /** S5 over the offline log: exactly-once append via epoch-idempotent
    * commits (see GraftLogWrite.toStreaming). */
  def writeLog(df: DataFrame, topicDir: String, checkpoint: String,
      partitions: Int = 4): DataStreamWriter[Row] =
    df.writeStream.format("graftlog")
      .option("path", topicDir)
      .option("partitions", partitions.toString)
      .option("checkpointLocation", checkpoint)

  /** S6 over the offline log: per-row `topic` column routes each record to
    * `<brokerDir>/<topic>` — the TopicNameExtractor analog, live. */
  def writeLogRouted(df: DataFrame, brokerDir: String, topicCol: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.withColumn("topic", col(topicCol))
      .writeStream.format("graftlog")
      .option("path", brokerDir)
      .option("routed", "true")
      .option("checkpointLocation", checkpoint)

  /** S8 console sink (`stream.print()`). */
  def printStream(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode("append")

  /** S7 table→stream + interactive-query serving (§2.10): materialize a
    * changelog into an in-memory table queryable by name from a second
    * session — the Spark analog of interactive queries over a store. */
  def serveAsTable(df: DataFrame, name: String,
      mode: String = "complete"): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(name).outputMode(mode)

  /** §2.10 LIVE state-store materialization of an UPDATE-mode changelog:
    * each micro-batch REPLACES the served rows of every key it touches
    * (anti-join out the stale rows, union in the batch) and republishes
    * the store as temp view `name` — the KTable/state-store upsert the
    * memory sink cannot do (its update mode APPENDS, so stale chart rows
    * would accumulate). This is how KafkaMusic's `MusicPlaysRestService`
    * reads a LIVE chart: the store always holds exactly the latest rows
    * per key, bounded by state size (top-k × groups), never by stream
    * length. The new store is localCheckpointed each batch so lineage
    * stays one batch deep and HTTP reads scan a materialized
    * aggregate-sized table. Multi-row keys are the point: a key's rows
    * (e.g. a group's whole chart) are swapped atomically as a unit.
    *
    * `isTombstone`: an operator whose key becomes EMPTY has nothing to
    * emit, so its stale rows would be served forever — unless it emits an
    * explicit per-key deletion marker (e.g. [[StreamOps.incrementalTopN]]
    * with emitEmpty=true: pos=0). A marker row counts for the stale-row
    * anti-join (the key WAS touched) but is filtered out of the store, so
    * the key's serving presence ends with its state.
    *
    * Restart semantics (documented limitation): the store is an in-memory
    * global temp view, so after a QUERY RESTART it starts empty and a
    * recovered key reappears only when its next emission arrives —
    * exactly a Kafka Streams app rebuilding its serving layer before
    * restoration finishes. A production deployment would bootstrap the
    * view from a persisted snapshot (writeStream to parquet + read back)
    * or run the chart in complete mode; within one process lifetime the
    * store is exact. */
  def serveUpserted(df: DataFrame, name: String, keyCols: Seq[String],
      isTombstone: Option[org.apache.spark.sql.Column] = None): DataStreamWriter[Row] =
    df.writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // foreachBatch executes on the stream's CLONED session, whose temp
        // views the serving session cannot see — a GLOBAL temp view is the
        // cross-session handle (read it as `global_temp.<name>`)
        val s = batch.sparkSession
        val gname = "global_temp." + name
        val b = batch.localCheckpoint()
        val keep = isTombstone.map(t => b.filter(!t)).getOrElse(b)
        val next =
          if (!s.catalog.tableExists(gname)) keep
          else s.table(gname)
            .join(b.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
            .unionByName(keep)
        next.localCheckpoint().createOrReplaceGlobalTempView(name)
      }
}
