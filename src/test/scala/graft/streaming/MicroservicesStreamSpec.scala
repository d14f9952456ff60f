package graft.streaming

import graft.SparkSpec
import graft.pipelines.OrderPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming end-to-end of the microservices order pipeline
  * (microservices/EndToEndTest.java:184-193): orders arrive over
  * micro-batches, the three validators fan out, verdicts aggregate, and
  * each order's state transitions CREATED → VALIDATED/FAILED — including
  * a validator verdict that arrives a batch LATER than its siblings'.
  * The foreachBatch recompute is the A7 streaming form SURVEY §7.4
  * prescribes: per batch, the accumulated order log re-derives the
  * validation state (retraction logic stays implicit). */
class MicroservicesStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val orderCols = Seq("order_id", "customer_id", "product", "quantity", "price", "ts")

  test("order states transition across micro-batches with cross-batch fraud/inventory memory") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val warehouse = Seq(("beer", 100.0), ("vodka", 100.0), ("whisky", 5.0))
      .toDF("product", "stock")
    val in = MemoryStream[(String, Long, String, Int, Double, Timestamp)]
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, String, Int, Double, Timestamp)]
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    val q = in.toDS().toDF(orderCols: _*).writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.as[(String, Long, String, Int, Double, Timestamp)].collect()
        if (rows.nonEmpty) {
          acc ++= rows
          val all = acc.toSeq.toDF(orderCols: _*)
          snapshots += OrderPipeline.validateOrders(all, warehouse)
            .select("order_id", "state").collect()
            .map(r => r.getString(0) -> r.getString(1)).toMap
        }
        ()
      }.start()
    try {
      in.addData(
        ("o1", 1L, "beer", 10, 5.0, ts("2024-01-01 10:00:00")),   // clean
        ("o3", 3L, "vodka", 10, 150.0, ts("2024-01-01 10:00:00")), // session total 1500
        ("o6", 4L, "whisky", 6, 100.0, ts("2024-01-01 10:00:00"))) // > stock 5
      q.processAllAvailable()
      in.addData(
        // same session as o3 (30 min later): 1500+600 >= 2000 -> fraud FAIL
        ("o4", 3L, "vodka", 4, 150.0, ts("2024-01-01 10:30:00")),
        // o6 FAILed so it reserved NOTHING: 5 <= 5 passes (cross-batch memory)
        ("o7", 4L, "whisky", 5, 100.0, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
    } finally quiesceAndStop(q)
    assert(snapshots.head === Map(
      "o1" -> "VALIDATED", "o3" -> "VALIDATED", "o6" -> "FAILED"))
    assert(snapshots.last === Map(
      "o1" -> "VALIDATED", "o3" -> "VALIDATED", "o6" -> "FAILED",
      "o4" -> "FAILED", "o7" -> "VALIDATED"))
  }

  test("a late-arriving validator verdict flips an order CREATED -> VALIDATED") {
    // ValidationsAggregatorService.java:96-139: an order stays CREATED
    // (pending) until all three rules report; the third verdict arriving
    // in a LATER batch flips the aggregate — and a FAIL flips immediately
    // without waiting for the rest.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val orders = Seq(
      ("oA", 1L, "beer", 1, 1.0, ts("2024-01-01 10:00:00")),
      ("oB", 2L, "beer", 1, 1.0, ts("2024-01-01 10:00:00"))).toDF(orderCols: _*)
    val vin = MemoryStream[(String, String, String)]
    val vacc = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val states = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    val q = vin.toDS().toDF("order_id", "check_type", "result")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.as[(String, String, String)].collect()
        if (rows.nonEmpty) {
          vacc ++= rows
          val v = vacc.toSeq.toDF("order_id", "check_type", "result")
          states += OrderPipeline.aggregateValidations(v, orders)
            .select("order_id", "state").collect()
            .map(r => r.getString(0) -> r.getString(1)).toMap
        }
        ()
      }.start()
    try {
      vin.addData(("oA", "ORDER_DETAILS_CHECK", "PASS"), ("oA", "FRAUD_CHECK", "PASS"),
        ("oB", "ORDER_DETAILS_CHECK", "FAIL"))
      q.processAllAvailable()
      vin.addData(("oA", "INVENTORY_CHECK", "PASS")) // the straggler verdict
      q.processAllAvailable()
    } finally quiesceAndStop(q)
    // batch 1: oA pending (2/3 verdicts), oB failed fast on one FAIL
    assert(states.head === Map("oA" -> "CREATED", "oB" -> "FAILED"))
    // batch 2: the late PASS completes oA -> VALIDATED
    assert(states.last === Map("oA" -> "VALIDATED", "oB" -> "FAILED"))
  }
}
