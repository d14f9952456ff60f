package graft.streaming

import org.apache.spark.sql.functions._

/** CHAMPION-LIST RECALL SWEEP — the measured curve behind `/search/hot`'s
  * approximation contract (the round-16 RecallSweep discipline applied to
  * text retrieval): how much of the EXACT top-10 does the capped-head hot
  * tier return, as a function of the head cap (the MaxTermK knob)?
  *
  * Truth side needs no second implementation: [[HotSearch.buildTermShard]]
  * with `cap = corpus doc count` makes the heads the FULL postings, and
  * [[HotSearch.score]] is then byte-identical to the cold `/search`
  * (ServingSpec pins that equivalence) — so truth and candidate go through
  * the SAME scorer and the sweep isolates exactly the cap.
  *
  * Queries are deterministic: the corpus's 24 highest-df terms (the terms
  * where the cap actually bites — rare terms fit any head) combined into
  * twelve 3-term queries by fixed index arithmetic. Per cap and ranker the
  * sweep reports mean recall@10 against the exact top-10 (ties broken by
  * doc_id on both sides, so the overlap is well-defined).
  *
  * Output: ONE JSON line. Knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  * Like every bench main: calib probe + load fields, nonzero exit on a
  * calib-poisoned box (the capture-honesty contract). */
object SearchSweep {

  private def load1: Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(cpus)
    val loadStart = load1
    val calib = graft.Calib.runRounded(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val postings = graft.ops.TextAnalysis.postingsFrame(docs).localCheckpoint()
    val stats = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).cast("long").as("corpus_tf"))
      .localCheckpoint()
    val dlens = postings.groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("dl"))
      .localCheckpoint()
    val nDocs = dlens.count()
    val totalLen = dlens.agg(sum(col("dl")).cast("long")).head.getLong(0)

    // the cap bites only on heavy terms: query over the 24 highest-df
    // (ties by term asc — deterministic on any corpus)
    val top = stats.orderBy(col("df").desc, col("term").asc)
      .select(col("term"), col("df")).limit(24).collect()
    val terms = top.map(_.getString(0))
    val maxDf = top.map(_.getLong(1)).max
    // three query classes: singles (the exactness guarantee should read
    // 1.000 at every cap), pairs, and triples (the adversarial
    // all-heavy-term case — a doc's rank depends on the SUM of
    // contributions, which no per-term impact order can fully capture)
    val singles = terms.take(12).map(Seq(_)).toSeq
    val pairs = (0 until 12).map(i => Seq(
      terms(i % terms.length), terms((i * 5 + 3) % terms.length)).distinct)
    val triples = (0 until 12).map(i => Seq(
      terms(i % terms.length),
      terms((i * 5 + 3) % terms.length),
      terms((i * 7 + 11) % terms.length)).distinct)
    val classes = Seq("q1" -> singles, "q2" -> pairs, "q3" -> triples)
    val queries = classes.flatMap(_._2)

    // truth: cap = corpus size ⇒ heads are the postings ⇒ HotSearch.score
    // equals the cold /search (the pinned equivalence)
    val truthShard = HotSearch.buildTermShard(
      stats, postings, dlens, nDocs.toInt, nDocs, totalLen)._3
    def top10(shard: java.util.HashMap[String, HotSearch.TermHead],
        q: Seq[String], bm25: Boolean): Set[Long] =
      HotSearch.score(q.flatMap(t => Option(shard.get(t))),
        nDocs, totalLen, bm25, 10).map(_._2).toSet
    val truth = (for {
      q <- queries; bm25 <- Seq(false, true)
    } yield (q, bm25) -> top10(truthShard, q, bm25)).toMap

    val caps = Seq(5, 10, 25, 50, 100, 250)
    val rows = caps.map { cap =>
      val built = HotSearch.buildTermShard(stats, postings, dlens, cap,
        nDocs, totalLen)
      val (tfShard, bmShard) = (built._3, built._4)
      def mean(shard: java.util.HashMap[String, HotSearch.TermHead],
          bm25: Boolean): Double = {
        val rs = queries.map { q =>
          val t = truth((q, bm25))
          if (t.isEmpty) 1.0
          else top10(shard, q, bm25).intersect(t).size.toDouble / t.size
        }
        rs.sum / rs.size
      }
      // bm25 is scored from its IMPACT-ordered list (the serving path);
      // the raw-tf-list bm25 number is kept as the before/after evidence
      // for the impact-ordering decision
      def meanOf(qs: Seq[Seq[String]],
          shard: java.util.HashMap[String, HotSearch.TermHead],
          bm25: Boolean): Double = {
        val rs = qs.map { q =>
          val t = truth((q, bm25))
          if (t.isEmpty) 1.0
          else top10(shard, q, bm25).intersect(t).size.toDouble / t.size
        }
        rs.sum / rs.size
      }
      val perClass = classes.map { case (name, qs) =>
        f""""${name}_tfidf":${meanOf(qs, tfShard, false)}%.3f,"${name}_bm25":${meanOf(qs, bmShard, true)}%.3f"""
      }.mkString(",")
      f""""cap_$cap":{"recall10_tfidf":${mean(tfShard, false)}%.3f,"recall10_bm25":${mean(bmShard, true)}%.3f,"recall10_bm25_tfhead":${mean(tfShard, true)}%.3f,$perClass}"""
    }

    val loadEnd = load1
    println(f"""{"metric":"search_hot_recall","unit":"recall@10","n_docs":$nDocs,"vocab_top_df":$maxDf,"n_queries":${queries.size},${rows.mkString(",")},"calib_sec":$calib,"calib_warning":${graft.Calib.warning(calib)},"load1_start":$loadStart%.2f,"load1_end":$loadEnd%.2f,"load_warning":${loadStart > 4}}""")
    spark.stop()
    graft.Calib.enforce(calib)
  }
}
