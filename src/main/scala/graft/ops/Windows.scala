package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Windowing operators (batch forms) — SURVEY.md §2.4 (W1–W5).
  *
  * Session windows live in Aggregations.sessionSpend (A9/W3); streaming
  * watermark/suppression forms live in graft.streaming.
  *
  * Reference sites:
  *  - tumbling: AnomalyDetectionLambdaExample.java:137, TopArticlesLambdaExample.java:195
  *  - hopping:  PageViewRegionLambdaExample.java:183
  *  - custom daily window (tz-aware, 18:00 start): window/DailyTimeWindows.java:30-67
  *  - grace / late data: window/CustomWindowTest.java:133
  */
object Windows {

  /** W1 tumbling window: hourly event counts per type. */
  def tumblingHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("event_type"), col("cnt"))

  /** W2 hopping window: 1-hour windows advancing every 15 minutes — each
    * event lands in 4 windows. */
  def hopping(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("event_type"), col("cnt"))

  /** W4 custom calendar window: daily windows that start at 18:00 in
    * Europe/Paris, DST-aware (DailyTimeWindows). The assignment shifts into
    * Paris local time, subtracts the 18 h start offset, truncates to the
    * local day, and converts the window-start back to UTC — so a window is
    * 23/24/25 UTC-hours long across DST transitions, exactly like the
    * reference's `windowsFor`. */
  /** DST-aware daily window assignment (DailyTimeWindows.windowsFor):
    * shift into local time, subtract the start-hour offset, truncate to
    * the local day, add the offset back, convert to UTC. Days around a
    * DST transition come out 23/25 UTC-hours long — the correct local
    * calendar — unlike a fixed-period `window(ts, "1 day", offset)`. */
  def dailyWindowStart(ts: org.apache.spark.sql.Column, tz: String,
      startHour: Int): org.apache.spark.sql.Column = {
    val local = from_utc_timestamp(ts, tz)
    val localDayStart = date_trunc("day", local - expr(s"INTERVAL $startHour HOURS"))
    to_utc_timestamp(localDayStart + expr(s"INTERVAL $startHour HOURS"), tz)
  }

  def dailyParis(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("window_start", dailyWindowStart(col("ts"), "Europe/Paris", 18))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** W5 watermark / late-data drop, batch model: arrival order is event_id;
    * the watermark is the running max event time minus a 10-minute grace.
    * Records older than the watermark at their arrival are dropped.
    *
    * Scale shape: the global running max is a two-level prefix scan, NOT a
    * single-partition window over the data. Rows bucket by
    * `event_id div 4096`; the running max WITHIN a bucket is a window
    * partitioned by bucket (parallel), and the max of all PRIOR buckets
    * comes from the bucket-grain summary table (rows/4096 — the only
    * global-order window runs there) broadcast back. greatest(local
    * running max, prior-bucket max) IS the global running max, so the
    * DuckDB oracle is unchanged and bit-exact. The production path is
    * still the streaming form (`withWatermark` in graft.streaming). */
  def lateDataFilter(s: SparkSession, dir: String): DataFrame = {
    val bucketWidth = 4096L
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"))
      .withColumn("b", expr(s"event_id div $bucketWidth"))
    val inBucket = W.partitionBy(col("b")).orderBy(col("event_id"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val prior = ev.groupBy(col("b")).agg(max(col("ts")).as("bmax"))
      .withColumn("prev_max", max(col("bmax")).over(
        W.orderBy(col("b")).rowsBetween(W.unboundedPreceding, -1)))
      .select(col("b"), col("prev_max"))
    // bucket-grain side (rows/4096): corpus-proportional, so un-hinted —
    // AQE broadcasts while it fits (round-11 rule, same as packedBins)
    ev.withColumn("local_max", max(col("ts")).over(inBucket))
      .join(prior, Seq("b"))
      .withColumn("wm",
        greatest(col("local_max"), col("prev_max")) - expr("INTERVAL 10 MINUTES"))
      .filter(col("ts") >= col("wm"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("kept"))
  }
}
