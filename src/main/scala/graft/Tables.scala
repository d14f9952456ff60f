package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet star schema (TESTDATA.md).
  *
  * Columns are selected explicitly so Catalyst can prune the parquet scan
  * to exactly what each query touches; callers should still `.select` the
  * columns they need as early as possible.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    =
    fanOut(s, s.read.parquet(s"$dir/orders.parquet"), Seq("o_orderkey"))
  def lineitem(s: SparkSession, dir: String): DataFrame  =
    fanOut(s, s.read.parquet(s"$dir/lineitem.parquet"),
      Seq("l_orderkey", "l_linenumber"))
  /** events.ts has shipped as either TIMESTAMP(MICROS) (readable directly)
    * or INT64 TIMESTAMP(NANOS), which Spark's vectorized reader rejects; in
    * the nanos generation, read it as a long and truncate to micros (exactly
    * what DuckDB does natively, so the oracle sees identical values).
    * Integer `div` keeps full precision — a double division would corrupt
    * 2024-epoch nanos (≈1.7e18 > 2^53). The branch is decided from the
    * footer schema (metadata-only, no data read). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    val fixed = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw // already TIMESTAMP(MICROS)
    }
    fanOut(s, fixed, Seq("event_id"))
  }
  /** The testdata parquet files are single-row-group, so Spark scans them
    * as ONE split — which would serialize every CPU-heavy per-row pipeline
    * (tokenize, shingle, hash, cosine) on one core. Fan the scan out to
    * the cluster's parallelism when the scan itself can't provide splits.
    * On production multi-split inputs (100 TB = thousands of row groups)
    * the condition is false and no shuffle is added.
    *
    * Round 20: the fan-out HASHES each table's primary key instead of the
    * old keyless round-robin. A keyless `repartition(n)` first pays a
    * LOCAL SORT of its whole input (sortBeforeRepartition, SPARK-23207 —
    * needed so retried tasks reproduce the same row placement), and on a
    * single-split scan that sort runs over the entire table on one core
    * (measured: 2× the whole checkpoint-build cost of c8's 600k-row
    * orders topic). Hash partitioning on a deterministic unique key needs
    * no such sort — row placement is a pure function of the row — and is
    * the guide-§2.5 fix for the same retry-determinism hazard. Unique
    * keys spread uniformly, and the known hashpartitioning lets
    * downstream same-key operations reuse the exchange. */
  private def fanOut(s: SparkSession, df: DataFrame,
      keys: Seq[String]): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    // metadata-only estimate (file listing): a single-row-group file yields
    // one populated split no matter how maxPartitionBytes slices it, so few
    // files => fan out. Production inputs have >= target files and skip the
    // shuffle. (df.rdd.getNumPartitions would force a full physical plan
    // per table load just to read this number.)
    if (df.inputFiles.length < target)
      df.repartition(target, keys.map(org.apache.spark.sql.functions.col): _*)
    else df
  }

  def documents(s: SparkSession, dir: String): DataFrame =
    fanOut(s, s.read.parquet(s"$dir/documents.parquet"), Seq("doc_id"))
  def embeddings(s: SparkSession, dir: String): DataFrame =
    fanOut(s, s.read.parquet(s"$dir/embeddings.parquet"), Seq("vec_id"))

  /** Exact table row count from parquet FOOTER metadata — no data scan,
    * no Spark job: footers already store per-row-group counts, which is
    * how a 100 TB index build should learn n (a `count()` action there
    * is a full extra pass over the corpus). Handles both the driver's
    * single-file tables and Spark-written part-file directories. */
  def parquetRowCount(s: SparkSession, path: String): Long = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
      else Array(root)
    files.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  def embeddingsRowCount(s: SparkSession, dir: String): Long =
    parquetRowCount(s, s"$dir/embeddings.parquet")
}
