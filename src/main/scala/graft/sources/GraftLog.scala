package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.collection.JavaConverters._
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftlog` — a partitioned append-log DataSource V2 with Kafka's
  * execution model (topic directory → numbered partitions → offset-ordered
  * segments), implemented end-to-end on Spark's connector API:
  * micro-batch streaming read with per-partition offsets, an
  * epoch-idempotent (exactly-once) streaming sink, batch read/write, and
  * per-row dynamic topic routing (the `TopicNameExtractor` analog,
  * reference EmailService.java:114-116).
  *
  * Purpose: the environment has no Kafka broker or connector jar, so the
  * reference's S1 (`builder.stream(topic)`) / S5 (`stream.to(topic)`) wire
  * path (WordCountLambdaExample.java:189,207) is otherwise untestable. The
  * log reproduces the MODEL the reference programs against — partitions as
  * the unit of parallelism, monotonic per-partition offsets as the resume
  * token, idempotent epoch commits as the EOS mechanism — so every
  * source/sink behavior (resume after stop, replayed-epoch dedup, routed
  * produce) is provable offline; swapping `format("graftlog")` for
  * `format("kafka")` is a one-line change (Sources.readLog/readTopic).
  *
  * Layout (one directory per topic):
  * {{{
  *   <topic>/p<K>/seg-<start%020d>-<count>.bin          committed segments
  *   <topic>/p<K>/cseg-<start>-<end>-<count>.bin        key-compacted segments
  *   <topic>/_staging/<uuid>                     task-staged, invisible to readers
  *   <topic>/_epochs/<queryId>-<epochId>         commit markers (EOS replay guard;
  *                                               a multi-topic epoch writes ONE marker,
  *                                               in its sorted-first topic — the atomic
  *                                               commit point)
  * }}}
  * Segment records are length-prefixed binary (tsMicros: i64, keyLen: i32,
  * key, valLen: i32, val; len = -1 encodes NULL) — no parse ambiguity, no
  * escaping. Commits `Files.move(ATOMIC_MOVE)` staged files into place, so
  * a concurrent reader's directory listing only ever sees whole segments.
  *
  * Scale notes. The unit of read parallelism is the log partition, exactly
  * Kafka's contract; a 1000-executor cluster reads a 1000-partition topic
  * with zero coordination beyond the driver's O(#segments) listing, which
  * is metadata-only (offset ranges live in segment FILE NAMES — planning
  * never opens data files; a reader skip-scans at most one segment's
  * prefix). Writes stage per (task × partition) and commit by rename: the
  * driver-side commit is O(#staged files), no data movement. I/O goes
  * through java.nio against a shared filesystem; a production deployment
  * would swap the ~6 filesystem calls for the Hadoop FileSystem API (S3/
  * HDFS) — the planning, offset, and commit logic is FS-agnostic.
  */
class GraftLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftlog"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLog.ReadSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftLogTable(properties.asScala.toMap)
}

object GraftLog {
  /** Read-side schema — the Kafka source's shape: key/value are BINARY
    * (a log carries bytes; typed serdes — Avro, JSON — layer on top) and
    * readers cast to string exactly as with `format("kafka")`
    * (Sources.readLog does the cast). */
  val ReadSchema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("ts", TimestampType), StructField("partition", IntegerType),
    StructField("offset", LongType)))

  val DefaultPartitions = 4

  // ---- topic-directory primitives (driver + executor) -----------------

  def partDir(topic: Path, p: Int): Path = topic.resolve(s"p$p")

  /** One committed segment: offset range [start, end), record count,
    * layout. `dense` segments (`seg-<start>-<count>.bin`, the append
    * path) hold exactly end−start records whose offsets are positional.
    * Compacted segments (`cseg-<start>-<end>-<count>.bin`, written by
    * [[compactPartition]]) cover the same contiguous offset RANGE but
    * store only the surviving records, each with an EXPLICIT offset
    * prefix — compaction leaves offset gaps, Kafka's compacted-log
    * shape. */
  case class Seg(start: Long, end: Long, count: Long, path: Path, dense: Boolean)

  /** Committed segments of one partition, offset-sorted. Offsets live in
    * the file name — listing is the only metadata read.
    *
    * Two resolution rules (ADVICE r10): a segment fully CONTAINED in a
    * compacted segment is superseded by it (the transient state while
    * [[compactPartition]] moves the merged file in before deleting the
    * originals — a concurrent lister sees both and deterministically
    * reads the compacted one); any OTHER overlap means two committers
    * raced the same offset range and reads would double-count, so it
    * fails loudly — graftlog's hard assumption is a single committer
    * per topic (see [[GraftLogCommitter]]). */
  def segments(topic: Path, p: Int): Seq[Seg] = {
    val dir = partDir(topic, p)
    if (!Files.isDirectory(dir)) return Nil
    val named = Files.list(dir).iterator().asScala.flatMap { f =>
      f.getFileName.toString match {
        case SegName(start, count) =>
          Some(Seg(start.toLong, start.toLong + count.toLong, count.toLong, f, dense = true))
        case CSegName(start, end, count) =>
          Some(Seg(start.toLong, end.toLong, count.toLong, f, dense = false))
        case _ => None
      }
    }.toSeq
    // compacted-first on range ties so the sweep prefers the merged file
    val sorted = named.sortBy(s => (s.start, -s.end, s.dense))
    val kept = mutable.ArrayBuffer.empty[Seg]
    var maxEnd = Long.MinValue
    sorted.foreach { s =>
      if (kept.nonEmpty && s.end <= maxEnd) {
        if (kept.last.dense)
          throw new IllegalStateException(
            s"graftlog: overlapping segments in $dir: ${s.path.getFileName} inside " +
              s"${kept.last.path.getFileName} — two committers wrote the same offset " +
              "range (graftlog requires a single committer per topic)")
        // else: superseded by the covering compacted segment — ignore
      } else if (kept.nonEmpty && s.start < maxEnd) {
        throw new IllegalStateException(
          s"graftlog: overlapping segments in $dir: ${kept.last.path.getFileName} and " +
            s"${s.path.getFileName} — two committers wrote the same offset range " +
            "(graftlog requires a single committer per topic)")
      } else { kept += s; maxEnd = s.end }
    }
    kept.toSeq
  }
  private val SegName = "seg-(\\d+)-(\\d+)\\.bin".r
  private val CSegName = "cseg-(\\d+)-(\\d+)-(\\d+)\\.bin".r

  /** Partition ids present on disk (created by writers on demand). */
  def partitions(topic: Path): Seq[Int] =
    if (!Files.isDirectory(topic)) Nil
    else Files.list(topic).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("p") && s.drop(1).forall(_.isDigit) => s.drop(1).toInt }
      .toSeq.sorted

  /** End offset (= next offset to assign) per partition. */
  def endOffsets(topic: Path): Map[Int, Long] =
    partitions(topic).map { p =>
      val segs = segments(topic, p)
      p -> (if (segs.isEmpty) 0L else segs.map(_.end).max)
    }.toMap

  /** Log retention, Kafka-style: delete committed segments of partition
    * `p` whose ENTIRE offset range lies below `minOffset` — whole segments
    * only, exactly the broker's log cleaner (a segment straddling the
    * cutoff survives intact). Surviving records keep their ORIGINAL
    * offsets: the offset is the record's identity, retention only moves
    * the log-start forward, and a consumer positioned below it simply
    * finds nothing there (Kafka's out-of-range → earliest-available
    * behavior falls out of the range-overlap planning).
    *
    * The ACTIVE (highest) segment is never deleted — also Kafka's rule —
    * because end offsets are derived from surviving segment names
    * (ADVICE r10): deleting every segment would reset the partition to
    * offset 0, re-issue already-used offsets to the next append, and
    * silently skip consumers checkpointed at the old end. Keeping the
    * last segment keeps offsets monotonic under any cutoff. Returns the
    * number of segments deleted. */
  def truncateBefore(topic: Path, p: Int, minOffset: Long): Int = {
    val victims = segments(topic, p).dropRight(1).filter(_.end <= minOffset)
    victims.foreach(s => Files.deleteIfExists(s.path))
    victims.size
  }

  def writeRecord(out: DataOutputStream, ts: Long, key: Array[Byte], value: Array[Byte]): Unit = {
    out.writeLong(ts)
    if (key == null) out.writeInt(-1) else { out.writeInt(key.length); out.write(key) }
    if (value == null) out.writeInt(-1) else { out.writeInt(value.length); out.write(value) }
  }

  /** A segment iterator whose file handle can be released on EVERY path:
    * exhaustion closes it, and callers that may abandon mid-stream
    * (exception during compaction, partial consumption) close() in a
    * finally — idempotent, so the exhaustion close and the finally close
    * compose (ADVICE r11: the handle leaked when consumption aborted). */
  trait SegIterator extends Iterator[(Long, Long, Array[Byte], Array[Byte])]
    with java.io.Closeable

  /** All records of one segment as (offset, ts, key, value) — driver-side
    * sequential access for [[compactPartition]] and tooling; executors
    * stream ranges via GraftLogPartitionReader instead. */
  def readSegment(seg: Seg): SegIterator = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(seg.path.toFile)))
    new SegIterator {
      private var i = 0L
      private var closed = false
      override def close(): Unit = if (!closed) { closed = true; in.close() }
      override def hasNext: Boolean = {
        val more = i < seg.count
        if (!more) close()
        more
      }
      override def next(): (Long, Long, Array[Byte], Array[Byte]) = {
        val off = if (seg.dense) seg.start + i else in.readLong()
        val ts = in.readLong()
        val kl = in.readInt()
        val key = if (kl < 0) null else { val b = new Array[Byte](kl); in.readFully(b); b }
        val vl = in.readInt()
        val value = if (vl < 0) null else { val b = new Array[Byte](vl); in.readFully(b); b }
        i += 1
        (off, ts, key, value)
      }
    }
  }

  /** Kafka key compaction (`cleanup.policy=compact` — the storage model
    * behind `builder.table(topic)` and changelog restore, reference
    * UserRegionLambdaExample.java:125): merge partition `p`'s committed
    * segments into ONE compacted segment keeping only the LAST record
    * per key, with ORIGINAL offsets preserved; a tombstone (null value)
    * removes its key — and itself, the post-delete-retention end state.
    * Null-KEY records have no compaction identity and are dropped,
    * matching the broker's rejection of unkeyed writes to compacted
    * topics.
    *
    * Concurrent-reader safety: the merged file covers the EXACT offset
    * range of the segments it replaces and is ATOMIC_MOVEd into place
    * BEFORE the originals are deleted, so a lister that races the swap
    * sees a containment overlap and deterministically resolves to the
    * compacted file ([[segments]]). Like retention, run it from the
    * single committer. Returns the number of records compacted away. */
  def compactPartition(topic: Path, p: Int): Long =
    // Same-JVM contention serializes on the committer MONITOR (a second
    // thread of this JVM holding the file lock would otherwise surface as
    // OverlappingFileLockException instead of blocking — ADVICE r11); the
    // file lock then arbitrates strictly CROSS-process, mirroring
    // GraftLogCommitter.commit's monitor-then-lock order (no deadlock).
    GraftLogCommitter.synchronized {
      val lock = GraftLogCommitter.lockTopic(topic.toString)
      try compactLocked(topic, p)
      finally GraftLogCommitter.unlockTopic(lock)
    }

  private[sources] def compactLocked(topic: Path, p: Int): Long = {
    val segs = segments(topic, p)
    if (segs.isEmpty) return 0L
    val latest = mutable.LinkedHashMap.empty[java.nio.ByteBuffer, (Long, Long, Array[Byte])]
    var total = 0L
    segs.foreach { seg =>
      val it = readSegment(seg)
      try it.foreach { case (off, ts, key, value) =>
        total += 1
        if (key != null) {
          if (value == null) latest.remove(java.nio.ByteBuffer.wrap(key))
          else latest.put(java.nio.ByteBuffer.wrap(key), (off, ts, value))
        }
      } finally it.close()
    }
    val survivors = latest.toSeq
      .map { case (k, (off, ts, v)) => (off, ts, k.array(), v) }.sortBy(_._1)
    val staging = topic.resolve("_staging")
    Files.createDirectories(staging)
    val tmpf = staging.resolve(UUID.randomUUID().toString)
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(tmpf.toFile)))
    try survivors.foreach { case (off, ts, k, v) =>
      out.writeLong(off); writeRecord(out, ts, k, v)
    } finally out.close()
    val name = f"cseg-${segs.head.start}%020d-${segs.last.end}%020d-${survivors.size}.bin"
    Files.move(tmpf, partDir(topic, p).resolve(name), StandardCopyOption.ATOMIC_MOVE)
    // The replaced originals are deleted only AFTER the covering cseg is
    // in place; a scan PLANNED before the swap holds the original paths,
    // so its lazily-opening readers fall back to re-listing and resolving
    // the covering cseg when a planned file has vanished
    // (GraftLogPartitionReader — the analog of Kafka deferring deletion
    // with file.delete.delay.ms; ADVICE r11). Readers already mid-stream
    // keep their POSIX handle regardless of the unlink.
    segs.foreach(s => if (s.path.getFileName.toString != name) Files.deleteIfExists(s.path))
    total - survivors.size
  }

  /** [[compactPartition]] over every partition of the topic. */
  def compactTopic(topic: Path): Long =
    partitions(topic).map(p => compactPartition(topic, p)).sum

  // ---- policy-driven compaction (cleanup.policy=compact) --------------

  /** Dirty-ratio threshold above which a `compact`-policy topic partition
    * self-compacts on commit — Kafka's `min.cleanable.dirty.ratio`
    * default. */
  val CompactDirtyRatio = 0.5

  /** Set/clear the topic-level cleanup policy — the analog of Kafka's
    * per-topic `cleanup.policy=compact` config (the broker owns the
    * policy; producers don't — UserRegionLambdaExample.java:125 relies on
    * the topic being created compacted). A `compact` topic is cleaned by
    * a policy check on the COMMIT path (the stand-in for the broker's
    * background log-cleaner thread, which this single-JVM model folds
    * into the committer where the topic lock is already held). */
  def setCleanupPolicy(topic: Path, policy: String): Unit = {
    Files.createDirectories(topic)
    Files.writeString(topic.resolve("_policy"), policy)
  }

  def cleanupPolicy(topic: Path): Option[String] = {
    val f = topic.resolve("_policy")
    if (Files.exists(f)) Some(Files.readString(f).trim) else None
  }

  /** Fraction of partition `p`'s records not yet covered by a compacted
    * segment: dense records AFTER the last cseg are dirty; a partition
    * with no cseg is entirely dirty. */
  def dirtyRatio(topic: Path, p: Int): Double = {
    val segs = segments(topic, p)
    val total = segs.map(_.count).sum
    if (total == 0) return 0.0
    val lastClean = segs.filterNot(_.dense).map(_.end).maxOption.getOrElse(0L)
    segs.filter(s => s.dense && s.end > lastClean).map(_.count).sum.toDouble / total
  }

  /** The commit-path policy check: compact partition `p` iff the topic's
    * cleanup policy is `compact`, the dirty ratio exceeds
    * [[CompactDirtyRatio]], and there is more than one segment (the
    * active segment alone is never cleaned — Kafka's rule). Caller MUST
    * hold the topic lock (the committer does). Returns records removed. */
  private[sources] def maybeCompactLocked(topic: Path, p: Int): Long =
    if (cleanupPolicy(topic).contains("compact") &&
        dirtyRatio(topic, p) > CompactDirtyRatio &&
        segments(topic, p).size > 1)
      compactLocked(topic, p)
    else 0L
}

/** One topic directory as a DSv2 table (read + write, batch + streaming). */
class GraftLogTable(props: Map[String, String]) extends Table
    with SupportsRead with SupportsWrite {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("graftlog requires a path (the topic directory)"))
  override def name(): String = s"graftlog:$path"
  override def schema(): StructType = GraftLog.ReadSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftLogScan(path,
        Option(options.get("startingOffsets")).getOrElse(
          props.getOrElse("startingoffsets", "earliest")))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val opts = info.options.asScala.toMap
    // SupportsStreamingUpdateAsAppend: update-mode changelogs append to the
    // log (latest-per-key wins downstream) — the Kafka sink's own contract.
    new WriteBuilder
        with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {
      override def build(): Write = new GraftLogWrite(path, info.schema(), opts,
        info.queryId())
    }
  }
}

// ---------------------------------------------------------------------------
// read side
// ---------------------------------------------------------------------------

/** Offset = per-partition end positions, serialized as sorted JSON. */
case class GraftLogOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sorted.map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")
}
object GraftLogOffset {
  def fromJson(s: String): GraftLogOffset = GraftLogOffset(
    "\"(\\d+)\":(\\d+)".r.findAllMatchIn(s)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

/** An offset range [start, end) of one log partition — the unit of read
  * parallelism, exactly Kafka's model. Segment (start, end, count, path,
  * dense) tuples ride along so executors never re-list the directory. */
case class GraftLogInputPartition(p: Int, start: Long, end: Long,
    segs: Seq[(Long, Long, Long, String, Boolean)]) extends InputPartition

/** `startingOffsets` mirrors the Kafka source option: `earliest` (default —
  * a batch pipeline over a log replays history) starts every partition at
  * 0; `latest` snapshots the end offsets at FIRST query start, so only
  * records appended after the stream comes up are processed (the Kafka
  * streaming default). Only the initial offset differs — resume from a
  * checkpoint ignores the option, exactly like Kafka. */
class GraftLogScan(path: String, startingOffsets: String = "earliest") extends Scan {
  override def readSchema(): StructType = GraftLog.ReadSchema
  override def description(): String = s"graftlog $path ($startingOffsets)"

  private def plan(from: Map[Int, Long], until: Map[Int, Long]): Array[InputPartition] =
    until.keys.toSeq.sorted.flatMap { p =>
      val s = from.getOrElse(p, 0L)
      val e = until(p)
      if (e <= s) None
      else Some(GraftLogInputPartition(p, s, e,
        GraftLog.segments(Paths.get(path), p)
          .filter(seg => seg.start < e && seg.end > s)
          .map(seg => (seg.start, seg.end, seg.count, seg.path.toString, seg.dense))))
    }.toArray

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      plan(Map.empty, GraftLog.endOffsets(Paths.get(path)))
    override def createReaderFactory(): PartitionReaderFactory = new GraftLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      override def initialOffset(): Offset =
        if (startingOffsets == "latest")
          GraftLogOffset(GraftLog.endOffsets(Paths.get(path)))
        else GraftLogOffset(
          GraftLog.endOffsets(Paths.get(path)).map { case (p, _) => p -> 0L })
      override def latestOffset(): Offset =
        GraftLogOffset(GraftLog.endOffsets(Paths.get(path)))
      override def deserializeOffset(json: String): Offset = GraftLogOffset.fromJson(json)
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        plan(start.asInstanceOf[GraftLogOffset].offsets,
          end.asInstanceOf[GraftLogOffset].offsets)
      override def createReaderFactory(): PartitionReaderFactory = new GraftLogReaderFactory
      override def commit(end: Offset): Unit = () // retention is administrative
      override def stop(): Unit = ()
    }
}

class GraftLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftLogPartitionReader(partition.asInstanceOf[GraftLogInputPartition])
}

/** Streams one partition's committed segments over [start, end). Dense
  * segments admit positional skipping of the pre-range prefix (records
  * are length-prefixed — a skip is two reads and two `skipBytes`, no
  * parsing); compacted segments are scanned with their explicit
  * per-record offsets.
  *
  * Offset gaps are tolerated only where legitimate (ADVICE r10): before
  * the FIRST segment (a retention-trimmed prefix) and inside compacted
  * segments (keys compacted away). A gap BETWEEN consecutive segments,
  * or a range end past the last segment, means a segment file is missing
  * — that fails loudly instead of silently reading "no data". A planned
  * segment whose FILE has vanished (compaction swapped a covering cseg in
  * after planning) is not a gap: the reader re-lists and resumes from the
  * covering segments, fencing re-emission with floor/nextOffset. */
class GraftLogPartitionReader(part: GraftLogInputPartition)
    extends PartitionReader[InternalRow] {
  private var segs = part.segs.sortBy(_._1).iterator
  private var in: DataInputStream = _
  private var dense = true
  private var recsLeft = 0L       // compacted path: records left in segment
  private var segEnd = -1L        // end offset of the open segment
  private var covered = -1L       // end of the last opened segment (-1: none)
  private var nextOffset: Long = part.start // dense path: next offset to emit
  private var floor: Long = part.start // compacted path: lowest offset to emit
  private var relistsLeft = 8     // bound repeated planned-segment losses
  private var row: InternalRow = _

  private def openNext(): Boolean = {
    if (in != null) { in.close(); in = null }
    if (!segs.hasNext) {
      if (covered < part.end)
        throw new IllegalStateException(
          s"graftlog: partition ${part.p} offset range [${part.start},${part.end}) not " +
            s"covered — segments end at $covered; a segment file is missing")
      return false
    }
    val (segStart, sEnd, count, f, isDense) = segs.next()
    // segStart < covered is legal after a re-list (a covering cseg starts
    // below the consumed position; floor/nextOffset fence re-emission);
    // a segment starting ABOVE the consumed position is a true gap.
    if (covered >= 0 && segStart > covered)
      throw new IllegalStateException(
        s"graftlog: offset gap in partition ${part.p} — segment starting at $segStart " +
          s"follows segment ending at $covered; a segment file is missing")
    val stream = try new FileInputStream(f) catch {
      case _: java.io.FileNotFoundException =>
        // The planned segment was replaced under us: paths are captured at
        // PLANNING time, and a compaction that ran since has ATOMIC_MOVEd
        // a covering cseg in and deleted this original (readers already
        // mid-stream keep their POSIX handle; only the lazy open can find
        // the file gone — ADVICE r11). Re-list the partition and resolve
        // the covering segments for the REMAINING range; task retries get
        // the same fallback instead of re-failing on the stale path.
        if (relistsLeft <= 0)
          throw new IllegalStateException(
            s"graftlog: segment $f vanished and re-listing did not converge " +
              s"(partition ${part.p}, range [${part.start},${part.end}))")
        relistsLeft -= 1
        val topic = Paths.get(f).getParent.getParent
        val resume = part.start max covered
        floor = floor max resume
        nextOffset = nextOffset max resume
        segs = GraftLog.segments(topic, part.p)
          .filter(s => s.end > resume && s.start < part.end)
          .map(s => (s.start, s.end, s.count, s.path.toString, s.dense))
          .sortBy(_._1).iterator
        return openNext()
    }
    covered = covered max sEnd
    in = new DataInputStream(new BufferedInputStream(stream))
    dense = isDense
    segEnd = sEnd
    recsLeft = count
    if (dense) {
      var skip = (nextOffset max segStart) - segStart
      nextOffset = nextOffset max segStart
      while (skip > 0) { // length-prefixed: skip without materializing
        in.skipBytes(8)
        val kl = in.readInt(); if (kl > 0) in.skipBytes(kl)
        val vl = in.readInt(); if (vl > 0) in.skipBytes(vl)
        skip -= 1
      }
    }
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (in == null) {
        if (!openNext()) return false
      } else if (dense) {
        if (nextOffset >= part.end) return false
        if (nextOffset >= segEnd) { if (!openNext()) return false }
        else {
          val ts = in.readLong()
          val kl = in.readInt()
          val key = if (kl < 0) null else { val b = new Array[Byte](kl); in.readFully(b); b }
          val vl = in.readInt()
          val value = if (vl < 0) null else { val b = new Array[Byte](vl); in.readFully(b); b }
          row = new GenericInternalRow(Array[Any](key, value, ts, part.p, nextOffset))
          nextOffset += 1
          return true
        }
      } else { // compacted: explicit offsets, possibly gapped
        if (recsLeft <= 0) { if (!openNext()) return false }
        else {
          val off = in.readLong()
          val ts = in.readLong()
          val kl = in.readInt()
          val key = if (kl < 0) null else { val b = new Array[Byte](kl); in.readFully(b); b }
          val vl = in.readInt()
          val value = if (vl < 0) null else { val b = new Array[Byte](vl); in.readFully(b); b }
          recsLeft -= 1
          if (off >= part.end) return false
          if (off >= floor) {
            row = new GenericInternalRow(Array[Any](key, value, ts, part.p, off))
            return true
          } // else: below the range / already emitted pre-re-list — skip
        }
      }
    }
    false // unreachable: the loop always returns
  }
  override def get(): InternalRow = row
  override def close(): Unit = if (in != null) in.close()
}

// ---------------------------------------------------------------------------
// write side
// ---------------------------------------------------------------------------

/** A task's staged output for one (topic, partition): file + record count. */
case class GraftLogCommitMessage(entries: Seq[(String, Int, String, Long)])
  extends WriterCommitMessage // (topicDir, partition, stagedPath, count)

/** Write = routed or fixed-topic append. Input schema is resolved by NAME
  * (ACCEPT_ANY_SCHEMA): `value` required; `key`, `ts`, `partition`,
  * `topic` optional. With a `topic` column and `routed=true`, `path` is
  * the broker root and each row lands in `<path>/<topic>` — the dynamic
  * TopicNameExtractor. Partitioning: explicit `partition` column if
  * present, else hash(key) % numPartitions, else round-robin batches to
  * partition 0 (null keys). */
class GraftLogWrite(path: String, schema: StructType, opts: Map[String, String],
    queryId: String) extends Write {
  private val numParts = opts.get("partitions").map(_.toInt)
    .getOrElse(GraftLog.DefaultPartitions)
  private val routed = opts.get("routed").exists(_.toBoolean)

  private def idx(name: String): Int = schema.fieldNames.indexOf(name)

  // Fail at planning time, not per-task (ADVICE r10): a missing 'value'
  // column would silently append all-null records; a routed write without
  // a 'topic' column has nowhere to route.
  require(idx("value") >= 0,
    s"graftlog write requires a 'value' column; input schema has [${schema.fieldNames.mkString(", ")}]")
  require(!routed || idx("topic") >= 0,
    s"graftlog routed write requires a 'topic' column; input schema has [${schema.fieldNames.mkString(", ")}]")

  private def isBinary(name: String): Boolean =
    schema.fields.find(_.name == name).exists(_.dataType == BinaryType)

  private def factoryCfg = GraftLogWriterConfig(path, routed, numParts,
    idx("key"), idx("value"), idx("ts"), idx("partition"), idx("topic"),
    isBinary("key"), isBinary("value"))

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val cfg = factoryCfg
      new DataWriterFactory {
        override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
          new GraftLogDataWriter(cfg)
      }
    }
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      GraftLogCommitter.commit(messages, None)
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      GraftLogCommitter.abort(messages)
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
      val cfg = factoryCfg
      new StreamingDataWriterFactory {
        override def createWriter(partitionId: Int, taskId: Long,
            epochId: Long): DataWriter[InternalRow] =
          new GraftLogDataWriter(cfg)
      }
    }
    /** EXACTLY-ONCE: the epoch marker makes a replayed commit (post-crash
      * micro-batch re-execution) a no-op — the reference's EOS produce
      * loop (S10) at the sink layer. */
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      GraftLogCommitter.commit(messages, Some(GraftLogCommitter.Epoch(queryId, epochId, path)))
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      GraftLogCommitter.abort(messages)
  }
}

case class GraftLogWriterConfig(path: String, routed: Boolean, numParts: Int,
    keyIdx: Int, valueIdx: Int, tsIdx: Int, partIdx: Int, topicIdx: Int,
    keyBinary: Boolean, valueBinary: Boolean)

/** Executor-side writer: stages one file per (topic, partition) touched by
  * this task; the driver assigns offsets at commit (rename), so tasks
  * never coordinate. */
class GraftLogDataWriter(cfg: GraftLogWriterConfig) extends DataWriter[InternalRow] {
  private val open = mutable.LinkedHashMap.empty[(String, Int), (Path, DataOutputStream, Array[Long])]

  private def streamFor(topicDir: String, p: Int): (DataOutputStream, Array[Long]) = {
    val (_, out, n) = open.getOrElseUpdate((topicDir, p), {
      val staging = Paths.get(topicDir, "_staging")
      Files.createDirectories(staging)
      val f = staging.resolve(UUID.randomUUID().toString)
      (f, new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f.toFile))),
        Array(0L))
    })
    (out, n)
  }

  override def write(row: InternalRow): Unit = {
    val key = if (cfg.keyIdx < 0 || row.isNullAt(cfg.keyIdx)) null
      else if (cfg.keyBinary) row.getBinary(cfg.keyIdx)
      else row.getUTF8String(cfg.keyIdx).getBytes
    val value = if (cfg.valueIdx < 0 || row.isNullAt(cfg.valueIdx)) null
      else if (cfg.valueBinary) row.getBinary(cfg.valueIdx)
      else row.getUTF8String(cfg.valueIdx).getBytes
    val ts = if (cfg.tsIdx < 0 || row.isNullAt(cfg.tsIdx)) 0L
      else row.getLong(cfg.tsIdx)
    val topicDir =
      if (cfg.routed && cfg.topicIdx >= 0) {
        if (row.isNullAt(cfg.topicIdx))
          throw new IllegalArgumentException(
            "graftlog: null 'topic' in routed write — every row must name its destination topic")
        Paths.get(cfg.path, row.getUTF8String(cfg.topicIdx).toString).toString
      } else cfg.path
    val p =
      if (cfg.partIdx >= 0 && !row.isNullAt(cfg.partIdx)) row.getInt(cfg.partIdx)
      else if (key != null)
        Math.floorMod(UTF8String.fromBytes(key).toString.hashCode, cfg.numParts)
      else 0
    val (out, n) = streamFor(topicDir, p)
    GraftLog.writeRecord(out, ts, key, value)
    n(0) += 1
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach { case (_, out, _) => out.close() }
    GraftLogCommitMessage(open.toSeq.map { case ((t, p), (f, _, n)) =>
      (t, p, f.toString, n(0))
    })
  }
  override def abort(): Unit = {
    open.values.foreach { case (f, out, _) =>
      out.close(); Files.deleteIfExists(f)
    }
  }
  override def close(): Unit = ()
}

/** Driver-side commit: per (topic, partition), read the current end offset
  * from the listing and rename staged files into offset-named segments —
  * atomic per file, metadata-only, O(#staged). The epoch marker is
  * written LAST; if a crash lands between renames and the marker, the
  * replayed epoch re-appends (at-least-once boundary identical to
  * Kafka's non-transactional producer); with the marker present the
  * replay is a no-op (exactly-once for the replay path Spark actually
  * takes — re-running a committed epoch after checkpoint recovery).
  *
  * CROSS-PROCESS mutual exclusion (ADVICE r10): offsets are assigned by
  * reading the current end from the listing, so two committers racing one
  * topic could both read the same end and rename overlapping segments.
  * In-JVM the `synchronized` serializes the driver's queries; ACROSS
  * processes (separate service JVMs sharing a topic, the reference's
  * deployment model) each topic is guarded by an OS advisory lock on
  * `<topic>/_lock` (java.nio FileLock — exclusive, blocking), held for
  * the rename-and-mark critical section. Kafka's analog is the broker
  * owning the partition leader epoch. [[GraftLog.segments]] keeps the
  * non-containment-overlap detector as the loud corruption backstop for
  * writers that bypass the lock. Multi-topic commits take locks in
  * sorted topic order (no deadlock between routed writers). */
object GraftLogCommitter {
  /** Epoch identity for the exactly-once replay guard. `base` is the
    * sink's configured path — the single topic dir for plain writes, the
    * broker-root dir for routed writes (topics resolve as `base/<topic>`)
    * — so the marker location depends only on the QUERY's configuration,
    * never on which topics this particular epoch's rows routed to
    * (ADVICE r12: a sorted-first-topic marker is missed when a recovered
    * epoch replays with a different topic set, re-appending
    * already-committed topics). */
  case class Epoch(queryId: String, epochId: Long, base: String) {
    def markerPath: Path = Paths.get(base, "_epochs", s"$queryId-$epochId")
  }

  def commit(messages: Array[WriterCommitMessage], epoch: Option[Epoch]): Unit =
    synchronized {
      val entries = messages.collect { case m: GraftLogCommitMessage => m.entries }.flatten
      if (entries.isEmpty) { epoch.foreach(markOnly); return }
      val topics = entries.map(_._1).distinct.sorted
      val locks = topics.map(lockTopic)
      try {
        // replay guard: ONE marker, at the sink's BASE path — a single
        // filesystem create is the atomic commit point, so a multi-topic
        // epoch can never land in a partial-marker state (the pre-r12
        // per-topic markers could: a crash mid-marking left topic A
        // marked and B not, and the all-markers replay test then
        // re-appended BOTH — duplicating A despite its marker). With one
        // marker the window is identical to the single-topic case: crash
        // before the marker → the whole epoch replays (at-least-once,
        // Kafka's non-transactional boundary); marker present → the
        // whole epoch is a no-op. The base-path location (not the
        // sorted-first topic of THIS commit's routing) makes replay
        // detection independent of the topic set, so a nondeterministic
        // source or routing cannot dodge the guard.
        val replayed = epoch.exists(e => Files.exists(e.markerPath))
        if (replayed) {
          entries.foreach { case (_, _, staged, _) => Files.deleteIfExists(Paths.get(staged)) }
          return
        }
        entries.groupBy(e => (e._1, e._2)).toSeq.sortBy(_._1).foreach {
          case ((topicDir, p), staged) =>
            val pd = GraftLog.partDir(Paths.get(topicDir), p)
            Files.createDirectories(pd)
            var off = GraftLog.endOffsets(Paths.get(topicDir)).getOrElse(p, 0L)
            // deterministic order: by staged path
            staged.sortBy(_._3).foreach { case (_, _, f, n) =>
              if (n > 0) {
                Files.move(Paths.get(f), pd.resolve(f"seg-$off%020d-$n.bin"),
                  StandardCopyOption.ATOMIC_MOVE)
                off += n
              } else Files.deleteIfExists(Paths.get(f))
            }
            // cleanup.policy=compact: the broker's background log cleaner,
            // folded into the commit path where this topic's lock is
            // already held — a long-running writer's topic self-compacts
            // once the dirty ratio crosses the policy threshold
            GraftLog.maybeCompactLocked(Paths.get(topicDir), p)
        }
        epoch.foreach(markOnly)
      } finally locks.reverse.foreach(unlockTopic)
    }

  /** Exclusive cross-process lock on one topic directory. Blocks until
    * acquired; the JVM-level `synchronized` above prevents the same-JVM
    * OverlappingFileLockException. */
  def lockTopic(topicDir: String): (java.nio.channels.FileChannel, java.nio.channels.FileLock) = {
    val lockPath = Paths.get(topicDir, "_lock")
    Files.createDirectories(lockPath.getParent)
    val ch = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    (ch, ch.lock())
  }

  def unlockTopic(l: (java.nio.channels.FileChannel, java.nio.channels.FileLock)): Unit = {
    l._2.release(); l._1.close()
  }

  private def markOnly(epoch: Epoch): Unit = {
    // single atomic commit point at the sink's base path
    Files.createDirectories(epoch.markerPath.getParent)
    Files.write(epoch.markerPath, Array.emptyByteArray)
  }

  def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: GraftLogCommitMessage => m.entries }.flatten
      .foreach { case (_, _, f, _) => Files.deleteIfExists(Paths.get(f)) }
}
