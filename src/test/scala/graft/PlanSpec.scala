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
