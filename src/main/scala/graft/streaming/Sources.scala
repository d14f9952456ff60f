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

  /** S1 `builder.stream(topic)`: topic → streaming DataFrame with string
    * key/value columns (the shape every reference topology starts from). */
  def readTopic(spark: SparkSession, brokers: String, topic: String,
      fromBeginning: Boolean = false): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", if (fromBeginning) "earliest" else "latest")
      .load()
      .select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("timestamp").as("ts"))

  /** S5 `stream.to(topic)`: fixed-topic sink. */
  def writeTopic(df: DataFrame, brokers: String, topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** S6 dynamic routing (`TopicNameExtractor`, EmailService.java:114-116):
    * the Kafka sink honors a per-row `topic` column — no fixed topic
    * option. Batch analog: `df.write.partitionBy(topicCol)`. */
  def writeRouted(df: DataFrame, brokers: String, topicCol: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.withColumn("topic", col(topicCol))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
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
}
