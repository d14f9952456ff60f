package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-proof instrumentation (BASELINE.md scaling table): for one sf
  * dir, report corpus sizes, the d8 label-phase round count, candidate-
  * pair output cardinalities, and fixed-knob vs occupancy-scaled-knob
  * timings for the three bucket-occupancy-bound operators (s5 SRP
  * near-dup, d6 SimHash pairs, s8 IVF build).
  *
  * The knob rule under measurement: bucket-local pair work is quadratic
  * in occupancy = corpus / #buckets, so a g× corpus at FIXED knobs costs
  * g²× — while re-sizing the knob to hold occupancy (planes/band-bits
  * += log2 g; IVF stride ≈ √n so C ≈ √n) restores ~linear total work.
  * Scaled knob values are derived from the measured corpus size with the
  * sf0.1 occupancy as the target, so the same binary probes any scale.
  */
object ScaleProbe {

  private def time2(df: => DataFrame): Double = {
    val reps = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    reps.min
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional skip list (comma-separated of: d6_fixed, d6_scaled,
    // s5_fixed, s8_fixed) — at the 100× corpus the KNOWN-quadratic
    // fixed-knob configs would run for hours producing billions of pairs;
    // the point there is the linear family + the scaled knobs.
    val skip = args.lift(1).map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set.empty[String])
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet").count()

    // occupancy targets = the sf0.1 design point of each committed query
    val planesScaled = math.max(8,
      math.round(math.log(vecs / (2000.0 / 256)) / math.log(2)).toInt)
    val bandBits = math.max(8,
      math.ceil(math.log(docs / (5000.0 / 256)) / math.log(2)).toInt)
    val bitsScaled = math.min(60, 4 * bandBits)
    val strideScaled = math.max(10, math.round(math.sqrt(vecs.toDouble)).toInt)

    // d8 label phase: rounds to fixed point + component count
    val pairs = Dedup.minhashLsh(spark, dir).select(col("doc_a"), col("doc_b"))
    val t0 = System.nanoTime()
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(pairs, "doc_id", "cluster_id")
    val d8Nodes = labels.count()
    val d8Sec = (System.nanoTime() - t0) / 1e9
    val d8Clusters = labels.agg(countDistinct(col("cluster_id"))).head.getLong(0)

    val d4Pairs = Dedup.minhashLsh(spark, dir).count()
    val d6Pairs = if (skip("d6_fixed")) -1L
      else Dedup.simhashPairs(spark, dir).count()
    val d6PairsScaled = if (skip("d6_scaled")) -1L
      else Dedup.simhashPairsScaled(spark, dir, bitsScaled).count()
    val s5Pairs = if (skip("s5_fixed")) -1L
      else Similarity.bucketedNearDup(spark, dir).count()
    val s5PairsScaled =
      Similarity.bucketedNearDupWith(spark, dir, planesScaled).count()

    val s5Fixed = if (skip("s5_fixed")) -1.0
      else time2(Similarity.bucketedNearDup(spark, dir))
    val s5Scaled = time2(Similarity.bucketedNearDupWith(spark, dir, planesScaled))
    val d6Fixed = if (skip("d6_fixed")) -1.0
      else time2(Dedup.simhashPairs(spark, dir))
    val d6Scaled = if (skip("d6_scaled")) -1.0
      else time2(Dedup.simhashPairsScaled(spark, dir, bitsScaled))
    val s8Fixed = if (skip("s8_fixed")) -1.0
      else time2(Similarity.ivfTopKWith(spark, dir, 1))
    val s8Scaled = time2(Similarity.ivfTopKWith(spark, dir, 1, strideScaled))

    println(
      s"""{"dir":"$dir","docs":$docs,"vecs":$vecs,"lineitem":$lineitem,""" +
      s""""d8_rounds":$rounds,"d8_nodes":$d8Nodes,"d8_clusters":$d8Clusters,""" +
      s""""d8_label_sec":${f"$d8Sec%.2f"},""" +
      s""""d4_pairs":$d4Pairs,"d6_pairs":$d6Pairs,""" +
      s""""d6_pairs_scaled":$d6PairsScaled,""" +
      s""""s5_pairs":$s5Pairs,"s5_pairs_scaled":$s5PairsScaled,""" +
      s""""knobs":{"planes_scaled":$planesScaled,"bits_scaled":$bitsScaled,""" +
      s""""stride_scaled":$strideScaled},""" +
      s""""sec":{"s5_fixed":${f"$s5Fixed%.2f"},"s5_scaled":${f"$s5Scaled%.2f"},""" +
      s""""d6_fixed":${f"$d6Fixed%.2f"},"d6_scaled":${f"$d6Scaled%.2f"},""" +
      s""""s8_fixed":${f"$s8Fixed%.2f"},"s8_scaled":${f"$s8Scaled%.2f"}}}""")
    spark.stop()
  }
}

/** BPE induction-knob probe (VERDICT r12 #4, BASELINE.md round-13): the
  * full-corpus t21 induction vs [[graft.ops.TextAnalysis
  * .bpeMergesSampled]] with the sample budget held at the sf0.1 design
  * point (mod ≈ docs/5000 → ~5000 sampled docs at any corpus size), plus
  * merge-SEQUENCE agreement between the regimes. The claim under
  * measurement: t21's cost is 6 sequential full-corpus rewrites, so at
  * 10× the corpus the fixed form pays ~10× while the sampled form re-buys
  * the sf0.1 cost — and BPE pair statistics concentrate fast enough that
  * a ~5k-doc sample learns the same merges. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    import graft.ops.TextAnalysis
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val mod = math.max(1, math.round(n / 5000.0).toInt)
    def time2(df: => DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    def mergeSeq(df: DataFrame): Seq[String] =
      df.orderBy(col("round")).select(col("pair")).collect()
        .map(_.getString(0)).toSeq
    val fullSec = time2(TextAnalysis.bpeMergesFrame(docs))
    val sampSec = time2(TextAnalysis.bpeMergesSampled(docs, mod))
    val full = mergeSeq(TextAnalysis.bpeMergesFrame(docs))
    val samp = mergeSeq(TextAnalysis.bpeMergesSampled(docs, mod))
    println(
      s"""{"dir":"$dir","docs":$n,"mod":$mod,""" +
      s""""full_sec":${f"$fullSec%.2f"},"sampled_sec":${f"$sampSec%.2f"},""" +
      s""""merges_equal":${full == samp},""" +
      s""""full":${full.mkString("[\"", "\",\"", "\"]")},""" +
      s""""sampled":${samp.mkString("[\"", "\",\"", "\"]")}}""")
    spark.stop()
  }
}
