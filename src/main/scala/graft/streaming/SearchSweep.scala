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
    // (ties by term asc — deterministic on any corpus). The ranked
    // vocabulary is collected once, wide enough for the realistic class
    // below (vocab·0 bytes of postings — terms only).
    val vocab = stats.orderBy(col("df").desc, col("term").asc)
      .select(col("term"), col("df")).limit(2000).collect()
    val terms = vocab.take(24).map(_.getString(0))
    val maxDf = vocab.take(24).map(_.getLong(1)).max
    // four query classes: singles (the exactness guarantee should read
    // 1.000 at every cap), pairs, and triples (the adversarial
    // all-heavy-term case — a doc's rank depends on the SUM of
    // contributions, which no per-term impact order can fully capture),
    // plus the REALISTIC mixed-df class (VERDICT r18 next #6): the fixed
    // index arithmetic can collide onto the same term set (ADVICE r18
    // #4 — a duplicated query double-weights the mean), so every class
    // is deduplicated BY TERM SET before averaging.
    def byTermSet(qs: Seq[Seq[String]]): Seq[Seq[String]] =
      qs.map(_.sorted).distinct
    val singles = terms.take(12).map(Seq(_)).toSeq
    val pairs = byTermSet((0 until 12).map(i => Seq(
      terms(i % terms.length), terms((i * 5 + 3) % terms.length)).distinct))
    val triples = byTermSet((0 until 12).map(i => Seq(
      terms(i % terms.length),
      terms((i * 5 + 3) % terms.length),
      terms((i * 7 + 11) % terms.length)).distinct))
    // realistic operational queries draw terms roughly ∝ corpus usage —
    // a Zipf rank profile over the vocabulary, NOT the adversarial
    // all-top-df regime q2/q3 probe. Rank is sampled LOG-UNIFORMLY over
    // the ranked vocab (density ∝ 1/rank, the Zipf usage curve) by a
    // golden-ratio low-discrepancy sequence: deterministic on any
    // corpus, no RNG, and the resulting 3-term queries mix one heavy
    // head term with mid/tail terms the way real query logs do.
    val phi = 0.6180339887498949
    def zrank(i: Int): Int = {
      val u = (i * phi) % 1.0
      math.min(vocab.length - 1,
        math.exp(u * math.log(vocab.length.toDouble)).toInt)
    }
    val zipf = byTermSet((0 until 12).map(i => Seq(
      vocab(zrank(3 * i)).getString(0),
      vocab(zrank(3 * i + 1)).getString(0),
      vocab(zrank(3 * i + 2)).getString(0)).distinct))
    val classes = Seq("q1" -> singles, "q2" -> pairs, "q3" -> triples,
      "qz" -> zipf)
    // the headline mean is over the deduplicated union — a query landing
    // in two classes must not be double-weighted there either
    val queries = byTermSet(classes.flatMap(_._2))

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

    // bm25 is scored from its IMPACT-ordered list (the serving path);
    // the raw-tf-list bm25 number is kept as the before/after evidence
    // for the impact-ordering decision. ONE mean implementation
    // (ADVICE r18 #4: the headline mean was a duplicated copy of this).
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

    val caps = Seq(5, 10, 25, 50, 100, 250)
    val rows = caps.map { cap =>
      val built = HotSearch.buildTermShard(stats, postings, dlens, cap,
        nDocs, totalLen)
      val (tfShard, bmShard) = (built._3, built._4)
      val perClass = classes.map { case (name, qs) =>
        f""""${name}_tfidf":${meanOf(qs, tfShard, false)}%.3f,"${name}_bm25":${meanOf(qs, bmShard, true)}%.3f"""
      }.mkString(",")
      f""""cap_$cap":{"recall10_tfidf":${meanOf(queries, tfShard, false)}%.3f,"recall10_bm25":${meanOf(queries, bmShard, true)}%.3f,"recall10_bm25_tfhead":${meanOf(queries, tfShard, true)}%.3f,$perClass}"""
    }

    // ── the df-PROPORTIONAL cap lever (VERDICT r18 next #6) ──────────
    // The realistic-class result motivates it: mid-df terms carry REAL
    // idf and truncated heads (the top-24 heavy terms' idf is
    // negligible, so q2/q3 was never the hard class — qz is). Lever:
    // per-term head depth max(flatCap, β·df) — heavy/mid terms gain
    // depth ∝ df, complete terms are untouched — measured against the
    // FLAT cap of EQUAL total memory (the honest comparison: any knob
    // can win by just spending more).
    val dfs = stats.select(col("df")).collect().map(_.getLong(0))
    def flatRows(c: Long) = dfs.map(math.min(_, c)).sum
    val leverBase = 100
    val levers = Seq(0.05, 0.1, 0.25).map { beta =>
      val budget = dfs.map(df =>
        math.min(df, math.max(leverBase.toLong, (beta * df).toLong))).sum
      // the equal-memory flat cap, by bisection over the df histogram
      var lo = leverBase.toLong; var hi = dfs.max
      while (hi - lo > 1) {
        val mid = (lo + hi) / 2
        if (flatRows(mid) <= budget) lo = mid else hi = mid
      }
      val dfProp = HotSearch.buildTermShardCap(stats, postings, dlens,
        greatest(lit(leverBase), (col("df") * beta).cast("long")),
        nDocs, totalLen)
      val flatEq = HotSearch.buildTermShard(stats, postings, dlens,
        lo.toInt, nDocs, totalLen)
      f""""lever_beta_$beta":{"rows":$budget,"flat_eq_cap":$lo,"recall10_bm25_dfprop":${
        meanOf(queries, dfProp._4, true)}%.3f,"recall10_bm25_flat_eq":${
        meanOf(queries, flatEq._4, true)}%.3f,"qz_bm25_dfprop":${
        meanOf(zipf, dfProp._4, true)}%.3f,"qz_bm25_flat_eq":${
        meanOf(zipf, flatEq._4, true)}%.3f,"qz_tfidf_dfprop":${
        meanOf(zipf, dfProp._3, false)}%.3f,"qz_tfidf_flat_eq":${
        meanOf(zipf, flatEq._3, false)}%.3f}"""
    }

    // closing-window probes AFTER every measured build (review r19 pass
    // 2: the lever arm briefly ran between the probes, where degradation
    // was invisible to the calib gate): both calib probes gate the
    // exit, both load windows set the warning
    val calibEnd = graft.Calib.runRounded(spark)
    val loadEnd = load1
    println(f"""{"metric":"search_hot_recall","unit":"recall@10","n_docs":$nDocs,"vocab_top_df":$maxDf,"n_queries":${queries.size},${rows.mkString(",")},${levers.mkString(",")},"calib_sec":$calib,"calib_sec_end":$calibEnd,"calib_warning":${graft.Calib.warning(calib, calibEnd)},"load1_start":$loadStart%.2f,"load1_end":$loadEnd%.2f,"load_warning":${loadStart > 4 || loadEnd > 12}}""")
    spark.stop()
    graft.Calib.enforce(calib, calibEnd)
  }
}
