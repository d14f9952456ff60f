package graft

import org.apache.spark.sql.functions._

/** Deterministic sf1-equivalent corpus generator for the BASELINE.md
  * scale proof (VERDICT r7 task 1): the heavy-query scaling exponents
  * need a ~10× step above sf0.1, and the driver testdata tops out there.
  *
  * Synthesis rules mirror the driver's sf0.1 tables (measured from the
  * data, TESTDATA.md records no generator source):
  *  - `documents`: 31-word vocabulary, uniform 10-100 words/doc,
  *    lang ∈ {en 41%, zh/es/fr/de ~14.7% each}, source = src(doc_id%20),
  *    ~4.6% near-dup clones of a uniform earlier doc with 1-3 token
  *    substitutions (sf0.1: 233 prefix-sharing groups / 5000 docs,
  *    pairwise 5-shingle Jaccard 0.89-0.99), ~0.16% exact dups
  *    (sf0.1: 8/5000). Fresh text, NOT replicas: replicating would
  *    multiply every dup-class size by the multiplier and change the
  *    bucket-occupancy profile the dedup family is measured on.
  *  - `embeddings`: unit-normalized 64-dim gaussians, label uniform
  *    0-9 (sf0.1 centroid norms ≈ 1/√n and zero pairs above cosine 0.5:
  *    the driver data is isotropic noise, so fresh gaussians match).
  *  - `lineitem`: the sf0.1 table replicated `mult`× with l_orderkey
  *    shifted by replica·(max+1) — order/line structure, per-supplier
  *    and per-part fan-out, prices and dates all preserved; each
  *    synthetic customer (l_suppkey) simply has mult× the orders, i.e.
  *    a higher event rate into the same session windows.
  *  - remaining star-schema tables are byte-copied (dimensions stay
  *    dimensions; c8's song/warehouse sides remain broadcast-sized).
  *
  * Single seeded driver-side RNG → byte-stable output across runs. The
  * output dir is git-ignored; this generator (committed) IS the data's
  * provenance.
  */
object ScaleData {

  val Vocab: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** Clustered-embeddings variant (VERDICT r14 #3): same row count as
    * the sf-mult corpus but with PLANTED cluster structure — the regime
    * residual quantization (s22) exists for, where the isotropic decade
    * corpora cannot show its fidelity gain (residuals of unclustered
    * gaussians are gaussians again; see BASELINE.md "ANN recall at the
    * decades"). Geometry mirrors the SimilaritySpec planted test:
    * centers ~ N(0, 5²) per dim (offsets dominate), member noise 0.2,
    * label = cluster id mod 10 (so the filtered paths s19/s23 stay
    * meaningful). Writes ONLY embeddings.parquet — the doc/lineitem
    * families are unaffected by embedding geometry. */
  def writeClusteredEmbeddings(outDir: String, mult: Int,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(8009)
    val nClusters = 64
    val centers = Array.fill(nClusters)(Array.fill(64)(rnd.nextGaussian() * 5.0))
    val nVecs = 2000 * mult
    val vecRows = (0 until nVecs).map { i =>
      val c = rnd.nextInt(nClusters)
      (i.toLong,
        centers(c).map(x => (x + rnd.nextGaussian() * 0.2).toFloat),
        c % 10)
    }
    vecRows.toDF("vec_id", "embedding", "label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("clustered-emb")) {
      val outDir = if (args.length > 1) args(1) else "/root/repo/testdata-sf1c"
      val mult = if (args.length > 2) args(2).toInt else 10
      val s = GraftSession.local(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      writeClusteredEmbeddings(outDir, mult, s)
      println(s"""{"out":"$outDir","vecs":${2000 * mult},"mode":"clustered-emb"}""")
      s.stop()
      return
    }
    val outDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val srcDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val mult = if (args.length > 2) args(2).toInt else 10
    // lineitem multiplier, separable from the doc/vec one: the second-
    // decade corpus (sf10-synth, mult=100) scales only the document/
    // embedding family — 100× lineitem would be 60M rows whose only
    // consumer (c8) is already measured at its own 10× step.
    val liMult = if (args.length > 3) args(3).toInt else mult
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val liRows = write(outDir, srcDir, mult, liMult, spark)
    println(s"""{"out":"$outDir","docs":${5000 * mult},"vecs":${2000 * mult},""" +
      s""""lineitem":$liRows,"mult":$mult,"li_mult":$liMult}""")
    spark.stop()
  }

  /** The corpus generator body, callable from tests (the decade-recall
    * spec regenerates a missing git-ignored corpus instead of failing on
    * a fresh checkout — byte-stable, so pinned floors stay valid).
    * Returns the synthesized lineitem row count. */
  def write(outDir: String, srcDir: String, mult: Int, liMult: Int,
      spark: org.apache.spark.sql.SparkSession): Long = {
    import spark.implicits._
    val rnd = new scala.util.Random(8008)

    // ---- documents -------------------------------------------------
    val nDocs = 5000 * mult
    val texts = new Array[String](nDocs)
    val langs = Array("zh", "es", "fr", "de")
    val docRows = (0 until nDocs).map { i =>
      val roll = rnd.nextDouble()
      val text =
        if (i > 0 && roll < 0.0016) texts(rnd.nextInt(i))
        else if (i > 0 && roll < 0.048) {
          val base = texts(rnd.nextInt(i)).split(" ")
          (0 until 1 + rnd.nextInt(3)).foreach { _ =>
            base(rnd.nextInt(base.length)) = Vocab(rnd.nextInt(Vocab.length))
          }
          base.mkString(" ")
        } else
          Array.fill(10 + rnd.nextInt(91))(
            Vocab(rnd.nextInt(Vocab.length))).mkString(" ")
      texts(i) = text
      val lang = if (rnd.nextDouble() < 0.412) "en" else langs(rnd.nextInt(4))
      (i.toLong, text, lang, "src" + (i % 20), text.length.toLong)
    }
    docRows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // ---- embeddings ------------------------------------------------
    val nVecs = 2000 * mult
    val vecRows = (0 until nVecs).map { i =>
      val v = Array.fill(64)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / norm).toFloat), rnd.nextInt(10))
    }
    vecRows.toDF("vec_id", "embedding", "label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // ---- lineitem: replicate with shifted order keys ---------------
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    val keyOffset = li.agg(max(col("l_orderkey"))).head.getLong(0) + 1
    li.withColumn("r", explode(lit((0 until liMult).toArray)))
      .withColumn("l_orderkey", col("l_orderkey") + col("r") * keyOffset)
      .drop("r")
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // ---- unchanged dimension/event tables: byte copies -------------
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "events").foreach { t =>
      Files.copy(Paths.get(s"$srcDir/$t.parquet"),
        Paths.get(s"$outDir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    li.count() * liMult
  }
}
