package graft.streaming

import java.nio.file.{Files, Paths}

import graft.GraftSession

/** One choreography service as its own OS PROCESS — the reference's
  * deployment model: each microservice is a separate JVM coupled only
  * through the broker (microservices/EndToEndTest.java:184-193 boots
  * OrderDetailsService and the aggregator as independent processes).
  * graftlog is a shared-filesystem log, so genuine process isolation
  * needs nothing beyond a shared topic directory: this main starts one
  * service with its OWN SparkSession and OWN checkpoint and runs until
  * the process is killed. Cross-process commit safety comes from the
  * committer's per-topic file lock (GraftLogCommitter) — two services in
  * two JVMs appending the same validations topic cannot interleave
  * offset assignment.
  *
  * CrossProcessChoreographySpec drives two of these: spawn → verify the
  * order flow crosses the process boundary → kill -9 one → respawn →
  * verify it resumes from its own checkpoint with EOS intact.
  *
  * args: role ordersDir validationsDir statesDir checkpointDir readyFile
  *       [variant: json (default) | wire]
  *
  * `wire` runs the registry-framed-Avro topology
  * ([[Choreography.startServiceWire]]) — the full reference deployment
  * model: separate JVMs, binary Avro on every topic, offsets owned by
  * the locked committer.
  */
object ServiceRunner {
  def main(args: Array[String]): Unit = {
    val (role, orders, validations, states, ckpt, readyFile, variant) =
      (args(0), args(1), args(2), args(3), args(4), args(5),
        if (args.length > 6) args(6) else "json")
    val spark = GraftSession.localStreaming(2, 2)
    spark.sparkContext.setLogLevel("ERROR")
    val q =
      if (variant == "wire")
        Choreography.startServiceWire(spark, role, orders, validations, states, ckpt)
      else Choreography.startService(spark, role, orders, validations, states, ckpt)
    // the parent orchestrator waits for this marker before publishing
    Files.writeString(Paths.get(readyFile), "ready")
    q.awaitTermination()
  }
}
