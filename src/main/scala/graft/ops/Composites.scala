package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite topologies — whole reference examples as single declarative
  * plans, built from the same pieces the operator inventory exercises.
  *
  * Reference sites:
  *  - PageViewRegionLambdaExample.java:150-194: views ⟕ user-region table,
  *    hopping window, count by region
  *  - TopArticlesLambdaExample.java:178-250: hourly windows, top articles
  *    per industry by view count
  *  - AnomalyDetectionLambdaExample.java:124-143: 1-minute windows, users
  *    with ≥3 events flagged
  */
object Composites {

  /** PageViewRegion: view events ⟕ broadcast user→region lookup (customer ⋈
    * nation stands in for the UserRegions table), counted in 1h/15min
    * hopping windows per region; missing users → UNKNOWN. */
  def pageViewRegion(s: SparkSession, dir: String): DataFrame = {
    val userRegion = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("region"))
    Tables.events(s, dir)
      .filter(col("event_type") === "view")
      .join(broadcast(userRegion), col("user_id") === col("c_custkey"), "left")
      .select(col("ts"), coalesce(col("region"), lit("UNKNOWN")).as("region"))
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("region"))
      .agg(count(lit(1)).as("view_count"))
      .select(col("w.start").as("window_start"), col("region"), col("view_count"))
  }

  /** TopArticles: hourly tumbling windows; per (window, event_type) the
    * top-3 users by event count — plays-desc, user-asc like the reference's
    * comparator chain. */
  def topArticles(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("user_id"), col("cnt"))
    val rank = Window.partitionBy(col("window_start"), col("event_type"))
      .orderBy(col("cnt").desc, col("user_id").asc)
    counts.withColumn("pos", row_number().over(rank)).filter(col("pos") <= 3)
  }

  /** Training-data prep funnel: quality-filter → exact-dedup → token count
    * per language — the canonical corpus-preparation chain, fused into one
    * plan (filters push into the scan; one shuffle for the dedup groupBy,
    * one for the final per-language rollup). */
  def prepFunnel(s: SparkSession, dir: String): DataFrame = {
    val toks = size(split(trim(col("text")), "\\s+"))
    val docs = Tables.documents(s, dir)
      .withColumn("n_words", toks)
      .filter(col("n_words") >= 20 && col("n_words") <= 2000)
    val deduped = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        // same text => same n_words; min(lang) makes the rare same-text/
        // different-label case deterministic
        min(col("lang")).as("lang"), min(col("n_words")).as("n_words"))
    deduped.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast("long").as("total_tokens"))
  }

  /** The prep funnel extended to the chunked training set: quality filter
    * → exact dedup (keeper = min-doc_id row, its lang rides along via
    * min_by) → context-window chunking → per-language chunk/token rollup.
    * The DuckDB oracle computes the chunk counts in CLOSED FORM
    * (nc = ⌈(n−overlap)/stride⌉, Σtokens = n + overlap·(nc−1)), so the
    * expanded chunk rows cross-validate against arithmetic that never ran
    * the expansion. `deduped` is checkpointed: it feeds both the chunker
    * and the lang join, and Catalyst does not reuse exchanges across
    * self-join subtrees. */
  def prepChunkedFunnel(s: SparkSession, dir: String): DataFrame = {
    val nWords = size(split(trim(col("text")), "\\s+"))
    val deduped = Tables.documents(s, dir)
      .withColumn("n_words", nWords)
      .filter(col("n_words") >= 20 && col("n_words") <= 2000)
      .groupBy(md5(col("text")).as("h"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("text")), col("doc_id")).as("d"))
      .select(col("d.doc_id").as("doc_id"), col("d.lang").as("lang"),
        col("d.text").as("text"))
      .localCheckpoint()
    // chunks roll up to DOC grain before the lang join: the join carries
    // one row per document, not per chunk, and the distinct-doc count
    // becomes a plain count — at scale the chunk-grain rows never shuffle
    // beyond their own (doc, chunk) aggregation
    TextAnalysis.chunkFrame(deduped)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("chunk_tokens"))
      .join(deduped.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chunks")).as("n_chunks"),
        sum(col("chunk_tokens")).as("total_chunk_tokens"))
  }

  /** WikiFeed schema (WikipediaFeedAvroExample; src/main/resources/avro/
    * io/confluent/examples/streams/wikifeed.avsc) — incl. the idiomatic
    * nullable union for `content`. */
  val wikiFeedSchemaJson: String =
    """{"type":"record","name":"WikiFeed","namespace":"graft.avro","fields":[
      |{"name":"username","type":"string"},
      |{"name":"is_new","type":"boolean"},
      |{"name":"content","type":["string","null"]}]}""".stripMargin

  /** WikipediaFeedAvro (WikipediaFeedAvroLambdaExample.java:130-136): the
    * reference's Avro-typed flagship — WikiFeed records arrive on the
    * wire, old feeds are filtered out, and new-user feeds are counted per
    * user. Here the records genuinely round-trip through Avro binary
    * (AvroCodec) before the filter+count, so the oracle (which aggregates
    * the raw table) fails if the wire format corrupts anything —
    * including null `content` union branches. */
  def wikipediaFeed(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AvroCodec
    val feed = Tables.events(s, dir).select(
      col("user_id").cast("string").as("username"),
      (col("event_type") === "signup").as("is_new"),
      // nullable content exercises the union branch
      when(col("event_id") % 10 =!= 0, col("props")).as("content"))
    val decoded = AvroCodec.decode(
      AvroCodec.encode(feed, wikiFeedSchemaJson), wikiFeedSchemaJson)
    decoded.filter(col("is_new"))
      .groupBy(col("username"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** AnomalyDetection: users generating ≥2 events within a 1-minute window
    * (the reference's KTable filter on windowed counts, O7 over W1; the
    * reference flags ≥3/min — the testdata's event rate is lower, so the
    * threshold is 2 to keep the query non-degenerate at every SF). */
  def anomalyDetection(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("w.start").as("window_start"), col("user_id"), col("cnt"))
}
