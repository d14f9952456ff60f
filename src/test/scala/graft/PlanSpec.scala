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
}
