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
    q1.stop()

    // new query instance, same checkpoint: the per-key counter must resume
    // from 2, not restart at 0.
    val q2 = start()
    in.addData(Event(2, ts(3000), 1, "w", 1.0))
    q2.processAllAvailable()
    q2.stop()

    assert(seen.get(2L) === Some(3L), s"got $seen")
  }

  test("incrementalTopN handles updates and tombstones like the add/subtract aggregate (TopArticles/KafkaMusic)") {
    // reference: the adder+subtractor pair of KafkaMusicExample.java:342-354
    // — an updated count displaces chart entries; a tombstone evicts.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamOps._
    val in = MemoryStream[ChangelogEntry]
    val q = incrementalTopN(in.toDS(), 2).toDF()
      .writeStream.format("memory").queryName("itn").outputMode("update").start()
    def chart(): Seq[(Int, Long, Double)] = {
      // last emitted chart for punk = rows of the final batch
      val batches = spark.table("itn").where("group = 'punk'").collect()
      // memory sink in update mode appends every emission; reconstruct the
      // latest chart as the rows emitted after the final update: take the
      // trailing rows with pos restarting at 1
      val rows = batches.map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      val lastStart = rows.lastIndexWhere(_._1 == 1)
      rows.drop(lastStart).toSeq
    }
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
    } finally q.stop()
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
    } finally q.stop()
    // song 1: 2 qualifying plays beats song 2 (1 play; its 10s play filtered)
    assert(chart === Map(("punk", 1) -> 1L, ("rock", 1) -> 3L))
  }
}
