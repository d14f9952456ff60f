package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-work CALIBRATION PROBE (VERDICT r13 #1 / r14 #2): a
  * deterministic job whose cost depends only on box conditions — never
  * on testdata, query code, or suite composition — recorded in every
  * bench JSON (`calib_sec` at capture start, `calib_sec_end` at end).
  *
  * Why: this box's throughput drifts up to 2× under co-tenancy that
  * `/proc/loadavg` does NOT see (round-13's measured +18–41% inflation
  * on untouched queries at load ≤1.3). Load fields flag visible
  * contention only; the probe measures the slowdown itself. The ratio
  * of `calib_sec` between two captures estimates their ambient speed
  * difference, so a cross-epoch comparison can separate "the code got
  * slower" from "the box got slower" — the round-7 comparison rule's
  * missing instrument.
  *
  * Work shape: 400M-row codegen'd long arithmetic across 32 input
  * partitions feeding one 64-group hash aggregate — saturates the same
  * CPU + shuffle machinery the suite uses, ~1.5 s on this box idle.
  * Constants are frozen; changing them breaks cross-round probe
  * comparability (treat like a bench query's definition).
  */
object Calib {
  private def pass(spark: SparkSession, rows: Long): Unit =
    spark.range(0L, rows, 1L, 32)
      .select((col("id") * 2654435761L % 1000003L).as("h"))
      .groupBy((col("h") % 64).as("b")).agg(sum(col("h")).as("s"))
      .queryExecution.toRdd.count()

  /** Self-warming: two untimed 10%-size passes first compile the probe's
    * codegen/JIT path, so the timed pass measures box speed — not JVM
    * cold-start — and the number is comparable across Bench (probe runs
    * post-warmup) and StreamBench/ServingBench (probe runs first). */
  def run(spark: SparkSession): Double = {
    pass(spark, 40000000L)
    pass(spark, 40000000L)
    val t0 = System.nanoTime()
    pass(spark, 400000000L)
    (System.nanoTime() - t0) / 1e9
  }

  /** Rounded for JSON embedding. */
  def runRounded(spark: SparkSession): Double =
    math.round(run(spark) * 1000.0) / 1000.0

  /** Contamination gate (VERDICT r15 #2): the probe exists so a
    * contaminated capture can't silently become a round's committed
    * record — this threshold makes it a GATE instead of a footnote.
    * Idle reference on this box is ≈0.7 s; quiet-epoch captures start
    * 0.7–1.4 s; the round-15 SERVBENCH capture whose Spark-tier rows
    * inverted the routing story started at 2.1 s. Default 1.5 s splits
    * those regimes; override with SPARK_GRAFT_CALIB_MAX. A malformed
    * override must not kill the bench before its JSON is emitted
    * (ADVICE r16) — warn and fall back to the default instead. */
  def warnThreshold: Double =
    sys.env.get("SPARK_GRAFT_CALIB_MAX") match {
      case None => 1.5
      case Some(raw) => raw.toDoubleOption.getOrElse {
        System.err.println(s"[graft] SPARK_GRAFT_CALIB_MAX='$raw' is not " +
          "a number — using default threshold 1.5 s")
        1.5
      }
    }

  /** True when any probe reading exceeds [[warnThreshold]] — emitted as
    * `calib_warning` in every bench JSON beside the raw `calib_sec`. */
  def warning(calibs: Double*): Boolean = calibs.exists(_ > warnThreshold)

  /** Refuse mode: with SPARK_GRAFT_CALIB_STRICT=1 a contaminated capture
    * exits nonzero AFTER printing its JSON (the numbers stay inspectable;
    * the nonzero exit keeps a capture script from committing them). */
  def enforce(calibs: Double*): Unit =
    if (sys.env.get("SPARK_GRAFT_CALIB_STRICT").contains("1") &&
        warning(calibs: _*)) {
      System.err.println(f"[graft] calib gate: probe ${calibs.map(c => f"$c%.2f").mkString("/")} s " +
        f"exceeds $warnThreshold%.2f s — contaminated capture refused " +
        "(unset SPARK_GRAFT_CALIB_STRICT to keep it)")
      sys.exit(3)
    }
}
