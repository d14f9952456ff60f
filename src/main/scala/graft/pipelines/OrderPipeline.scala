package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's microservices order-validation pipeline (SURVEY.md §3.3)
  * composed from the operator layer: three validators fan out over the
  * orders stream, their verdicts aggregate back per order, and the final
  * state rejoins the original order — the EndToEndTest dataflow
  * (microservices/EndToEndTest.java:184-193) as one declarative plan.
  *
  * Every stage is a plain DataFrame transform, so the same code runs batch
  * (tested against golden scenarios in OrderPipelineSpec) or streaming
  * (orders as a stream, warehouse as a broadcast static table, the
  * session-window fraud check via StreamOps.sessionCounts shapes).
  *
  * Expected `orders` schema: order_id, customer_id, product, quantity,
  * price, ts. `warehouse`: product, stock. `payments`: order_id, amount,
  * ts. `customers`: customer_id, level.
  */
object OrderPipeline {

  /** FraudService.java:49 */
  val FraudLimit = 2000.0
  /** ValidationsAggregatorService.java:96 */
  val NumRules = 3

  private def v(rule: String, pass: Column): Column =
    struct(lit(rule).as("check_type"),
      when(pass, "PASS").otherwise("FAIL").as("result"))

  /** OrderDetailsService.java:175-183: stateless field validation. */
  def orderDetails(orders: DataFrame): DataFrame =
    orders.select(col("order_id"),
      v("ORDER_DETAILS_CHECK",
        col("quantity") >= 0 && col("price") >= 0 && col("product").isNotNull).as("val"))
      .select(col("order_id"), col("val.check_type").as("check_type"),
        col("val.result").as("result"))

  /** FraudService.java:88-110: session-windowed (1 h inactivity gap) spend
    * per customer; each order is judged against the session total AT ITS
    * ARRIVAL (the reference's cache-disabled changelog emits one decision
    * per order) — batch form: running sum within the session island. */
  def fraudCheck(orders: DataFrame): DataFrame = {
    // order_id breaks ts ties so the running total is deterministic when
    // several orders share a timestamp (day-granular feeds)
    val byCust = Window.partitionBy(col("customer_id"))
      .orderBy(col("ts"), col("order_id"))
    val newSession = when(
      col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(byCust) > 3600, 1)
      .otherwise(when(lag(col("ts"), 1).over(byCust).isNull, 1).otherwise(0))
    val sessioned = orders
      .withColumn("sess", sum(newSession).over(
        byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val inSession = Window.partitionBy(col("customer_id"), col("sess"))
      .orderBy(col("ts"), col("order_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned
      .withColumn("session_total",
        sum(col("quantity") * col("price")).over(inSession))
      .select(col("order_id"),
        v("FRAUD_CHECK", col("session_total") < FraudLimit).as("val"))
      .select(col("order_id"), col("val.check_type").as("check_type"),
        col("val.result").as("result"))
  }

  /** InventoryService.java:132-169: per-product reservation — orders (in
    * time order) reserve stock while it lasts; an order that would push
    * the reserved quantity past the warehouse stock FAILs and reserves
    * nothing. The non-reserving FAIL makes this a running conditional
    * state machine, expressed with an aggregate over the ordered order
    * list per product (batch twin of StreamOps.reservation). */
  def inventoryCheck(orders: DataFrame, warehouse: DataFrame): DataFrame = {
    val lines = orders
      .join(broadcast(warehouse), Seq("product"), "left")
      .select(col("order_id"), col("product"), col("quantity"),
        coalesce(col("stock"), lit(0.0)).as("stock"), col("ts"))
    // collect per product (bounded: orders per product per batch), walk in
    // ts order carrying the reserved total through the conditional.
    val walked = lines
      .groupBy(col("product"), col("stock"))
      .agg(array_sort(collect_list(struct(col("ts"), col("order_id"),
        col("quantity")))).as("os"))
      .select(col("product"),
        explode(aggregate(col("os"),
          struct(lit(0.0).as("reserved"),
            array().cast(ArrayType(StructType(Seq(
              StructField("order_id", StringType),
              StructField("result", StringType))))).as("out")),
          (acc, o) => {
            val fits = acc.getField("reserved") + o.getField("quantity") <= col("stock")
            struct(
              when(fits, acc.getField("reserved") + o.getField("quantity"))
                .otherwise(acc.getField("reserved")).as("reserved"),
              concat(acc.getField("out"), array(struct(
                o.getField("order_id").as("order_id"),
                when(fits, "PASS").otherwise("FAIL").as("result")))).as("out"))
          },
          acc => acc.getField("out"))).as("r"))
      .select(col("r.order_id").as("order_id"),
        lit("INVENTORY_CHECK").as("check_type"), col("r.result").as("result"))
    walked
  }

  /** ValidationsAggregatorService.java:96-139: an order FAILs as soon as
    * any rule FAILs, becomes VALIDATED once all NumRules rules PASS, and
    * stays CREATED while verdicts are still outstanding — the pending
    * state matters in the streaming form, where a validator's verdict can
    * arrive in a later micro-batch than its siblings'. */
  def aggregateValidations(validations: DataFrame, orders: DataFrame): DataFrame = {
    val verdict = validations
      .groupBy(col("order_id"))
      .agg(sum(when(col("result") === "PASS", 1).otherwise(0)).as("n_pass"),
        sum(when(col("result") === "FAIL", 1).otherwise(0)).as("n_fail"))
      .select(col("order_id"),
        when(col("n_fail") > 0, "FAILED")
          .when(col("n_pass") >= NumRules, "VALIDATED")
          .otherwise("CREATED").as("state"))
    orders.drop("state").join(verdict, Seq("order_id"), "left")
      .withColumn("state", coalesce(col("state"), lit("CREATED")))
  }

  /** The full validation dataflow: fan out to the three services, union
    * their verdicts (the shared order-validations topic), aggregate, and
    * rejoin the orders stream. */
  def validateOrders(orders: DataFrame, warehouse: DataFrame): DataFrame = {
    val validations = orderDetails(orders)
      .unionByName(fraudCheck(orders))
      .unionByName(inventoryCheck(orders, warehouse))
    aggregateValidations(validations, orders)
  }

  /** Per-order_id (order_id, state, n_rows, total_qty) WITHOUT the
    * orders rejoin (round-19 optimization): the details verdict is
    * order-grain and narrow, so each orders row's quantity rides on it
    * through the one verdict shuffle — the final state needs nothing
    * else from the orders row, so the second shuffle + sort-merge
    * rejoin of the full orders table is pure waste for a state-grain
    * consumer. Duplicate-id semantics match [[validateOrders]] exactly:
    * a repeated order_id pools its duplicates' verdicts into one state
    * (that is what [[aggregateValidations]]'s groupBy does) and the
    * rejoin then fans that state back onto every duplicate row —
    * preserved here as `n_rows` (the details-branch row count; details
    * emits exactly one verdict per orders row) and `total_qty` (the
    * duplicates' quantity sum). Batch-only shape: every order has all
    * [[NumRules]] verdicts in one pass, so the CREATED branch is the
    * same dead arm it is in [[validateOrders]]'s batch output —
    * OrderPipelineSpec pins equality between the two forms.
    *
    * PRECONDITION (ADVICE r19 #2): order_id must be non-null. The rejoin
    * in [[validateOrders]] is a null-rejecting equi-join, so a null-id
    * row stays CREATED there, while this groupBy would pool all null-id
    * rows into one group and assign them a real state. Every current
    * caller synthesizes a non-null order_id; a caller with nullable ids
    * must route them around this form. */
  def validationStates(orders: DataFrame, warehouse: DataFrame): DataFrame = {
    // the details verdict inline with the quantity column attached
    // (orderDetails is a narrow projection of orders — re-deriving it
    // here costs one expression, not a join)
    val details = orders.select(col("order_id"),
      when(col("quantity") >= 0 && col("price") >= 0 && col("product").isNotNull,
        1).otherwise(0).as("p"), col("quantity").cast("double").as("quantity"))
      .select(col("order_id"), col("p"), (lit(1) - col("p")).as("f"),
        lit(1L).as("row_cnt"), col("quantity"))
    val fraud = fraudCheck(orders).select(col("order_id"),
      when(col("result") === "PASS", 1).otherwise(0).as("p"),
      when(col("result") === "FAIL", 1).otherwise(0).as("f"),
      lit(0L).as("row_cnt"), lit(null).cast("double").as("quantity"))
    val inv = inventoryCheck(orders, warehouse).select(col("order_id"),
      when(col("result") === "PASS", 1).otherwise(0).as("p"),
      when(col("result") === "FAIL", 1).otherwise(0).as("f"),
      lit(0L).as("row_cnt"), lit(null).cast("double").as("quantity"))
    details.unionByName(fraud).unionByName(inv)
      .groupBy(col("order_id"))
      .agg(sum(col("p")).as("n_pass"), sum(col("f")).as("n_fail"),
        sum(col("row_cnt")).as("n_rows"), sum(col("quantity")).as("total_qty"))
      .select(col("order_id"),
        when(col("n_fail") > 0, "FAILED")
          .when(col("n_pass") >= NumRules, "VALIDATED")
          .otherwise("CREATED").as("state"),
        col("n_rows"), col("total_qty"))
  }

  /** EmailService.java:100-116: orders ⋈ payments within ±1 minute, then
    * a broadcast (GlobalKTable) join to customers; `topic` is the dynamic
    * routing column (per-record destination = customer level). */
  def emailEnrichment(orders: DataFrame, payments: DataFrame,
      customers: DataFrame): DataFrame =
    orders.alias("o")
      .join(payments.alias("p"),
        col("o.order_id") === col("p.order_id") &&
          col("p.ts") >= col("o.ts") - expr("INTERVAL 1 MINUTE") &&
          col("p.ts") <= col("o.ts") + expr("INTERVAL 1 MINUTE"))
      .join(broadcast(customers), Seq("customer_id"))
      .select(col("o.order_id").as("order_id"), col("customer_id"),
        col("o.quantity").as("quantity"), col("o.price").as("price"),
        col("p.amount").as("amount"), col("level"),
        col("level").as("topic"))
}
