package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-layout evidence for the 100 TB design claims: bucketing
  * co-locates the big-join keys so the join plans ZERO exchanges, and a
  * partitioned layout prunes non-matching partitions at the scan. These
  * are the techniques SURVEY §4 prescribes for the fact-fact joins and
  * date/type-scoped scans; this spec proves Spark actually plans them. */
class LayoutSpec extends SparkSpec {

  test("co-located bucketed join plans no exchange on either side") {
    val loc = Files.createTempDirectory("graft-bucketdb").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucketdemo LOCATION '$loc'")
    try {
      Tables.orders(spark, sf001)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_bucketdemo.orders_b")
      Tables.lineitem(spark, sf001)
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_bucketdemo.lineitem_b")
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("graft_bucketdemo.orders_b")
          .join(spark.table("graft_bucketdemo.lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("qty"))
        val n = j.count()
        assert(n > 0)
        val plan = j.queryExecution.executedPlan.toString
        // both sides are bucketed on the join key: the join AND the
        // follow-on aggregation reuse the bucketing — no shuffle anywhere
        assert(!plan.contains("Exchange"), s"unexpected exchange:\n${plan.take(2000)}")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"expected a co-located join:\n${plan.take(800)}")
        assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
          s"expected bucketed scans:\n${plan.take(2000)}")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally spark.sql("DROP DATABASE IF EXISTS graft_bucketdemo CASCADE")
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf001)
      .select(col("event_id"), col("event_type"), col("value"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val n = q.count()
    assert(n > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    // the equality predicate must land in PartitionFilters (pruning),
    // not survive as a post-scan Filter over all partitions
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("click"), s"predicate not pushed to partition pruning: $scanLine")
  }
}
