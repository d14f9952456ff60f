package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's microservices CHOREOGRAPHY (SURVEY §3.3,
  * microservices/EndToEndTest.java:184-193) run as real separate services
  * over real topics — each service its own streaming query with its own
  * checkpoint, coupled only through graftlog topics, exactly how the
  * reference's OrderDetailsService / FraudService /
  * ValidationsAggregatorService couple through Kafka topics:
  *
  *   orders ─┬─ details service ──▶ validations ─┐
  *           └─ limit service   ──▶ validations ─┴─ aggregator ──▶ states
  *
  * Asserted: verdicts from independent services interleave on the shared
  * validations topic; the aggregator's update-mode changelog appends to
  * the states topic and latest-per-key yields the final state machine
  * (FAILED on any FAIL, VALIDATED on all passes); a full stop/restart of
  * every service resumes from per-service checkpoints — the new order
  * flows through, history is not reprocessed, and each service's
  * exactly-once sink keeps validations at exactly one verdict per
  * (order, service). */
class ChoreographySpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"choreo-$name")
    d.toFile.deleteOnExit(); d.toString
  }

  test("three services over topics: fan-out verdicts, aggregate, restart resume") {
    import spark.implicits._
    val orders = tmp("orders"); val validations = tmp("validations")
    val states = tmp("states")
    val ck = Map("details" -> tmp("ck-details"), "limit" -> tmp("ck-limit"),
      "agg" -> tmp("ck-agg"))

    def publishOrder(id: String, product: String, qty: Int, price: Double): Unit =
      Seq((id, s"""{"product":"$product","quantity":$qty,"price":$price}"""))
        .toDF("key", "value")
        .write.format("graftlog").option("partitions", "2").mode("append").save(orders)

    val orderSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "product STRING, quantity INT, price DOUBLE")

    // two independent validator services, one shared verdicts topic
    def detailsService() = Sources.writeLog(
      Sources.readLog(spark, orders)
        .select(col("key"), from_json(col("value"), orderSchema).as("o"))
        .select(col("key"), concat(lit("""{"check":"DETAILS","result":""""),
          when(col("o.quantity") >= 0 && col("o.price") >= 0 && col("o.product").isNotNull,
            "PASS").otherwise("FAIL"), lit("\"}")).as("value")),
      validations, ck("details")).start()
    def limitService() = Sources.writeLog(
      Sources.readLog(spark, orders)
        .select(col("key"), from_json(col("value"), orderSchema).as("o"))
        .select(col("key"), concat(lit("""{"check":"LIMIT","result":""""),
          when(col("o.quantity") * col("o.price") < 2000.0, "PASS").otherwise("FAIL"),
          lit("\"}")).as("value")),
      validations, ck("limit")).start()
    // aggregator: FAILED on any FAIL, VALIDATED once both checks PASS,
    // CREATED while pending — an update-mode changelog appended to states
    def aggregatorService() = Sources.writeLog(
      Sources.readLog(spark, validations)
        .select(col("key"),
          get_json_object(col("value"), "$.check").as("check"),
          get_json_object(col("value"), "$.result").as("result"))
        .groupBy(col("key"))
        // each service emits exactly ONE verdict per (order, check) — the
        // EOS sink guarantees it (asserted below) — so a plain count of
        // PASSes equals the distinct-check count (streaming aggregates
        // cannot plan countDistinct)
        .agg(count(when(col("result") === "FAIL", 1)).as("n_fail"),
          count(when(col("result") === "PASS", 1)).as("n_pass"))
        .select(col("key"),
          when(col("n_fail") > 0, "FAILED")
            .when(col("n_pass") === 2, "VALIDATED")
            .otherwise("CREATED").as("value")),
      states, ck("agg")).outputMode("update").start()

    def latestStates(): Map[String, String] =
      spark.read.format("graftlog").load(states)
        .select(col("key").cast("string").as("key"),
          col("value").cast("string").as("value"), col("partition"), col("offset"))
        .groupBy("key")
        .agg(max_by(col("value"), struct(col("partition"), col("offset"))).as("state"))
        .as[(String, String)].collect().toMap

    def runRound(): Unit = {
      val d = detailsService(); val l = limitService()
      try { d.processAllAvailable(); l.processAllAvailable() }
      finally { d.stop(); l.stop() }
      val a = aggregatorService()
      try a.processAllAvailable() finally a.stop()
    }

    publishOrder("o1", "beer", 10, 5.0)     // clean: both PASS
    publishOrder("o2", "vodka", 20, 150.0)  // 3000 >= 2000: LIMIT FAIL
    runRound()
    assert(latestStates() === Map("o1" -> "VALIDATED", "o2" -> "FAILED"))

    // full choreography restart: new order flows through per-service
    // checkpoints; settled orders are not reprocessed
    publishOrder("o3", "whisky", 2, 100.0)
    runRound()
    assert(latestStates() === Map(
      "o1" -> "VALIDATED", "o2" -> "FAILED", "o3" -> "VALIDATED"))

    // exactly-once across the restart: one verdict per (order, service)
    val verdictCounts = spark.read.format("graftlog").load(validations)
      .select(col("key").cast("string").as("key"),
        get_json_object(col("value").cast("string"), "$.check").as("check"))
      .groupBy("key", "check").count().as[(String, String, Long)].collect()
    assert(verdictCounts.length === 6) // 3 orders x 2 services
    assert(verdictCounts.forall(_._3 === 1L),
      s"duplicate verdicts: ${verdictCounts.filter(_._3 > 1).mkString(",")}")
  }
}
