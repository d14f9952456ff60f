package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for large-scale training-data pipelines —
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard (the embedding-cosine
  * near-dup variant lives in Similarity).
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison —
  * exact dedup is a hash groupBy; MinHash/SimHash bucket candidates with
  * LSH bands so the join key is (band, bucket) and only same-bucket pairs
  * are compared. All hashes derive from md5, so the DuckDB oracle can
  * reproduce them bit-for-bit (no engine-private hash functions).
  *
  * The reference's streaming event-id dedup (SURVEY.md §2.8,
  * EventDeduplicationLambdaIntegrationTest.java:84-158) maps to
  * dropDuplicates + watermark; its batch form is `exactById`.
  */
object Dedup {

  /** Tokenize to lowercase words. */
  private val tokens: Column =
    filter(split(lower(col("text")), "[^a-z0-9]+"), w => length(w) > 0)

  /** §2.8 event-id dedup, batch form: first occurrence per id wins. */
  def exactById(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_event"), count(lit(1)).as("n_dups"))

  /** Exact content dedup: hash-groupBy on the full text; keep the lowest
    * doc_id of each duplicate class. */
  def exactText(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  // ---- MinHash + LSH -------------------------------------------------

  val NumPerms = 16
  val Bands = 4 // 4 bands × 4 rows

  /** 3-word shingles of the document text. */
  private def shingleCol(n: Int): Column =
    when(size(tokens) >= n,
      array_distinct(transform(sequence(lit(0), size(tokens) - n),
        i => array_join(slice(tokens, i + 1, lit(n)), " "))))
      .otherwise(array(array_join(tokens, " ")))

  /** MinHash signature: perm i = min over shingles of md5(i:shingle). */
  private def minhashSig(shingles: Column): Seq[Column] =
    (0 until NumPerms).map { i =>
      array_min(transform(shingles, sh => md5(concat(lit(s"$i:"), sh)))).as(s"mh$i")
    }

  /** MinHash signatures per document (inspectable intermediate). */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id") +: minhashSig(shingleCol(3)): _*)

  /** MinHash+LSH near-dup pairs: band signatures into buckets, join within
    * buckets only, then score candidates by signature agreement.
    * Emits pairs (a < b) whose estimated Jaccard ≥ 0.5. */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(s, dir)
    val rows = NumPerms / Bands
    val banded = sigs.select(col("doc_id") +:
      (0 until Bands).map { b =>
        md5(concat_ws("|", (b * rows until (b + 1) * rows).map(i => col(s"mh$i")): _*))
          .as(s"bucket$b")
      }: _*)
    val bandCols = (0 until Bands).map { b =>
      banded.select(lit(b).as("band"), col("bucket" + b).as("bucket"), col("doc_id"))
    }
    val bucketed = bandCols.reduce(_ unionByName _)
    val l = bucketed.as("l")
    val r = bucketed.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
          && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val sigA = sigs.toDF("a_id" +: (0 until NumPerms).map(i => s"a_mh$i"): _*)
    val sigB = sigs.toDF("b_id" +: (0 until NumPerms).map(i => s"b_mh$i"): _*)
    val agree = (0 until NumPerms)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    candidates
      .join(sigA, col("doc_a") === col("a_id"))
      .join(sigB, col("doc_b") === col("b_id"))
      .select(col("doc_a"), col("doc_b"),
        (agree.cast(DoubleType) / NumPerms).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
  }

  // ---- SimHash -------------------------------------------------------

  val SimHashBits = 32

  /** SimHash per document: each distinct word votes ±1 on 32 bits drawn
    * from its md5; bit j of the fingerprint is 1 iff the vote sum > 0.
    * Word-hash = first 8 hex chars of md5 → 32-bit int (via conv). */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val words = array_distinct(tokens)
    val wordHash = conv(substring(md5(col("w")), 1, 8), 16, 10).cast(LongType)
    val exploded = Tables.documents(s, dir)
      .select(col("doc_id"), explode(words).as("w"))
      .select(col("doc_id"), wordHash.as("h"))
    val bitVotes = (0 until SimHashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j")
    }
    val fp = (0 until SimHashBits).map { j =>
      when(col(s"v$j") > 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)
    exploded.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs: LSH on 4 bands of 8 bits each (a pair within
    * Hamming distance 3 shares at least one band); exact Hamming distance
    * computed on candidates only; emits pairs with distance ≤ 3. */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val fps = simhash(s, dir)
    val banded = (0 until 4).map { b =>
      fps.select(lit(b).as("band"),
        shiftright(col("simhash"), b * 8).bitwiseAND(0xFF).as("bucket"),
        col("doc_id"), col("simhash"))
    }.reduce(_ unionByName _)
    val l = banded.as("l")
    val r = banded.as("r")
    val xorCol = col("l.simhash").bitwiseXOR(col("r.simhash"))
    l.join(r, col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
        && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(xorCol).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  // ---- exact n-gram Jaccard (oracle-friendly ground truth) -----------

  /** Exact word-set Jaccard over a deterministic document subset
    * (doc_id % 20 == 0): pairs with similarity ≥ 0.3. The subset keeps the
    * all-pairs comparison bounded; at full scale minhashLsh is the
    * scalable path and this is its audit query. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), explode(array_distinct(tokens)).as("w"))
    val sizes = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = docs.toDF("a_id", "w")
      .join(docs.toDF("b_id", "w"), Seq("w"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.toDF("a_id", "na"), Seq("a_id"))
      .join(sizes.toDF("b_id", "nb"), Seq("b_id"))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        (col("shared").cast(DoubleType) / (col("na") + col("nb") - col("shared")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.3)
  }
}
