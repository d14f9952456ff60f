package graft

/** Runs every PlanAudit physical-plan check as a test assertion at
  * sf0.01, so a plan regression (a broadcast falling back to SortMergeJoin
  * after a threshold change, a filter no longer reaching the parquet scan,
  * a checkpoint silently dropped) fails `sbt test` instead of waiting for
  * someone to regenerate PLANS.md and read the VIOLATION line.
  *
  * One test per check keeps failures addressable; the queries materialize
  * at sf0.01 so AQE's final plan — the one a cluster would execute — is
  * what gets asserted.
  */
class PlanSpec extends SparkSpec {
  private val sf001dir = "/root/testdata/sf0.01"

  PlanAudit.checks.foreach { case (name, claim, must, mustNot) =>
    test(s"plan check: $name") {
      val (plan, missing, present) = PlanAudit.evaluate(spark, sf001dir, name, must, mustNot)
      assert(missing.isEmpty && present.isEmpty,
        s"$name plan violation (claim: $claim): missing=$missing present=$present\n" +
          plan.linesIterator.map(_.take(200)).take(40).mkString("\n"))
    }
  }

  PlanAudit.hintChecks.foreach { case (name, claim) =>
    test(s"hint audit: $name") {
      val bad = PlanAudit.unboundedHints(spark, sf001dir, name)
      assert(bad.isEmpty,
        s"$name forces broadcast of an unbounded id-list (claim: $claim): $bad")
    }
  }

  PlanAudit.globalWindowChecks.foreach { name =>
    test(s"global-window audit: $name") {
      val bad = PlanAudit.unboundedGlobalWindows(spark, sf001dir, name)
      assert(bad.isEmpty,
        s"$name has an un-partitioned Window outside bucket grain: $bad")
    }
  }

  test("global-window audit negative control: a corpus-grain global window IS detected") {
    // Guards the audit against vacuous green: a deliberately global
    // running sum over doc_id must surface; the two-level packedBins
    // form over the same input must not.
    import org.apache.spark.sql.catalyst.expressions.Attribute
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, size, split, sum}
    val d = Tables.documents(spark, sf001dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val global = d.withColumn("cum",
      sum(col("n")).over(Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    global.queryExecution.toRdd.count()
    val globalWins = PlanAudit.collectWindows(global.queryExecution.executedPlan)
      .filter(_.partitionSpec.isEmpty)
    assert(globalWins.nonEmpty, "WindowExec collection is broken")
    assert(globalWins.exists(_.orderSpec.map(_.child).exists {
      case a: Attribute => a.name == "doc_id"; case _ => false
    }), "the corpus-grain ordering column was not surfaced")
    // and the audited two-level form over the SAME input: every
    // un-partitioned window runs at bucket grain
    val twoLevel = graft.ops.TextAnalysis.packedBins(d)
    twoLevel.queryExecution.toRdd.count()
    val twoLevelGlobals = PlanAudit.collectWindows(twoLevel.queryExecution.executedPlan)
      .filter(_.partitionSpec.isEmpty)
      .map(_.orderSpec.map(_.child).collect { case a: Attribute => a.name })
    assert(twoLevelGlobals.nonEmpty && twoLevelGlobals.forall(_.forall(_ == "b")),
      s"packedBins global windows not at bucket grain: $twoLevelGlobals")
  }

  test("hint audit negative control: a forced unbounded broadcast IS detected") {
    // Guards the audit itself against vacuous green: a deliberately
    // hinted corpus-sized side must surface as a violation, and the same
    // side behind the bench bound must not.
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    import org.apache.spark.sql.functions.{broadcast, col}
    val docs = Tables.documents(spark, sf001dir)
    def hints(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
      }
    val unbounded = docs.join(broadcast(docs.select(col("doc_id"))), Seq("doc_id"))
    assert(hints(unbounded).nonEmpty, "ResolvedHint collection is broken")
    val bounded = docs.join(
      broadcast(docs.filter(col("doc_id") < 10).select(col("doc_id"))), Seq("doc_id"))
    assert(hints(bounded).exists(h =>
      PlanAudit.benchBounded(h.child.toString)), "bench-bound matcher is broken")
    assert(!hints(unbounded).forall(h =>
      PlanAudit.benchBounded(h.child.toString)), "unbounded hint slipped the matcher")
  }
}
