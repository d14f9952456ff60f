package graft.pipelines

import graft.SparkSpec
import java.sql.Timestamp

/** End-to-end pipeline spec mirroring microservices/EndToEndTest.java:
  * orders flow through all three validators and reach VALIDATED/FAILED. */
class OrderPipelineSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  import OrderPipeline._

  private def ordersDf = {
    import spark.implicits._
    Seq(
      // clean order: passes all three rules
      ("o1", 1L, "beer", 10, 5.0, ts("2024-01-01 10:00:00")),
      // negative quantity: ORDER_DETAILS fails
      ("o2", 2L, "beer", -1, 5.0, ts("2024-01-01 10:01:00")),
      // two orders in one session totalling >= 2000: the second fails fraud
      ("o3", 3L, "vodka", 10, 150.0, ts("2024-01-01 10:00:00")),
      ("o4", 3L, "vodka", 10, 60.0, ts("2024-01-01 10:30:00")),
      // same customer, NEW session (>1h gap): passes fraud again
      ("o5", 3L, "beer", 1, 10.0, ts("2024-01-01 12:31:00")),
      // exceeds warehouse stock of whisky (5): inventory fails
      ("o6", 4L, "whisky", 6, 100.0, ts("2024-01-01 10:00:00"))
    ).toDF("order_id", "customer_id", "product", "quantity", "price", "ts")
  }

  private def warehouseDf = {
    import spark.implicits._
    Seq(("beer", 100.0), ("vodka", 100.0), ("whisky", 5.0))
      .toDF("product", "stock")
  }

  test("orders reach VALIDATED or FAILED through the three validators (EndToEndTest)") {
    val got = validateOrders(ordersDf, warehouseDf)
      .select("order_id", "state").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "o1" -> "VALIDATED",
      "o2" -> "FAILED",     // details: quantity < 0
      "o3" -> "VALIDATED",  // first order of the session, total 1500 < 2000
      "o4" -> "FAILED",     // session total 2100 >= 2000 at arrival
      "o5" -> "VALIDATED",  // new session after >1h silence
      "o6" -> "FAILED"      // only 5 whisky in stock
    ))
  }

  test("validationStates matches validateOrders state-for-state and carries row count + quantity sum (round-19 rejoin removal)") {
    import org.apache.spark.sql.functions.col
    // duplicate order_id: validateOrders pools its verdicts into one
    // state and fans it back onto both rows — validationStates must
    // report the same state with n_rows=2 and the quantity sum
    val dup = ordersDf.unionByName(ordersDf.filter(col("order_id") === "o1"))
    val viaJoin = validateOrders(dup, warehouseDf)
      .groupBy(col("order_id"), col("state"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.sum(col("quantity").cast("double")).as("total_qty"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    val viaUnion = validationStates(dup, warehouseDf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(viaUnion === viaJoin)
  }

  test("fraud check judges each order against the running session total (FraudService)") {
    val fraud = fraudCheck(ordersDf).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(fraud("o3") === "PASS")
    assert(fraud("o4") === "FAIL")
    assert(fraud("o5") === "PASS")
  }

  test("inventory reservation: a failing order reserves nothing (InventoryService)") {
    import spark.implicits._
    val orders = Seq(
      ("a", 1L, "gin", 4, 1.0, ts("2024-01-01 10:00:00")),
      ("b", 2L, "gin", 3, 1.0, ts("2024-01-01 10:01:00")), // 4+3 > 6 -> FAIL
      ("c", 3L, "gin", 2, 1.0, ts("2024-01-01 10:02:00"))  // 4+2 <= 6 -> PASS
    ).toDF("order_id", "customer_id", "product", "quantity", "price", "ts")
    val wh = Seq(("gin", 6.0)).toDF("product", "stock")
    val got = inventoryCheck(orders, wh).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got === Map("a" -> "PASS", "b" -> "FAIL", "c" -> "PASS"))
  }

  test("unknown product has zero stock and fails inventory") {
    import spark.implicits._
    val orders = Seq(("x", 1L, "nosuch", 1, 1.0, ts("2024-01-01 10:00:00")))
      .toDF("order_id", "customer_id", "product", "quantity", "price", "ts")
    val got = inventoryCheck(orders, warehouseDf).collect()
    assert(got.head.getString(2) === "FAIL")
  }

  test("email enrichment joins payments within the window and routes by level (EmailService)") {
    import spark.implicits._
    val payments = Seq(
      ("o1", 50.0, ts("2024-01-01 10:00:30")),   // within 1 min
      ("o3", 1500.0, ts("2024-01-01 10:30:00"))  // 30 min late: no match
    ).toDF("order_id", "amount", "ts")
    val customers = Seq((1L, "platinum"), (3L, "gold")).toDF("customer_id", "level")
    val got = emailEnrichment(ordersDf, payments, customers).collect()
    assert(got.length === 1)
    assert(got.head.getAs[String]("order_id") === "o1")
    assert(got.head.getAs[String]("topic") === "platinum")
  }
}
