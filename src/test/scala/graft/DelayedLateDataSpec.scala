package graft

import graft.model.Envelope
import graft.operators.{DelayedBuckets, Dispatch}
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class DelayedLateDataSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed delayed index: due scan is partition-pruned and matches the full scan") {
    val env = graft.model.Envelope.fromEvents(spark, sf001)
    val idx = Files.createTempDirectory("graft-delayed").toString + "/idx"
    DelayedBuckets.buildIndex(env, idx)

    val t = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val due = DelayedBuckets.dueAt(spark, idx, t)

    // correctness: bucketed result == naive full-scan result
    val naive = Dispatch.dueMessages(env, lit(t))
      .filter(col(Envelope.DeliverAt).isNotNull)
    assert(due.count() == naive.count())

    // scale property: the scan carries a partition filter on due_bucket
    val plan = due.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(due_bucket"), plan.take(600))
    // and actually prunes: fewer files read than exist in the index
    val allBuckets = spark.read.parquet(idx)
      .select("due_bucket").distinct().count()
    val readBuckets = due.select("due_bucket").distinct().count()
    assert(readBuckets < allBuckets)
  }

  test("redelivery backoff composes with the delayed-due index (§2.10 ↔ §2.11)") {
    // the full broker loop: unacked-timeout redelivery stamps
    // deliver_at = now + backoff (NegativeAcksTracker), and those rows
    // then flow through the SAME at-scale delayed-dispatch machinery as
    // producer-delayed messages — the bucketed index must hold exactly
    // the redelivered set, dispatch nothing before its backoff expires,
    // and dispatch precisely the due prefix as time advances
    val env = graft.model.Envelope.fromEvents(spark, sf001)
    val now = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val delivered = env.filter(col(Envelope.Offset) % 2 === 0)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"),
        col(Envelope.PublishTime).as("delivered_at"))
    val acks = env.filter(col(Envelope.Offset) % 4 === 0)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))
    val redelivered = graft.streaming.AckState.redeliverOnTimeout(
      env, delivered, acks, now, ackTimeoutMs = 3600000L,
      backoffBaseMs = 60000L)
    val nRedelivered = redelivered.count()
    assert(nRedelivered > 0)

    val idx = Files.createTempDirectory("graft-redel-idx").toString + "/idx"
    DelayedBuckets.buildIndex(redelivered, idx)

    // before ANY backoff expires (backoffs start at now + 60s): nothing due
    assert(DelayedBuckets.dueAt(spark, idx, now).count() == 0L,
      "no redelivered row may dispatch before its backoff")
    // redelivery_count ∈ 1..5 → backoffs 60·2^0..2^4 s; at now+16min
    // every bucket is due — the full redelivered set dispatches once
    val later = new java.sql.Timestamp(now.getTime + 16 * 60 * 1000L)
    assert(DelayedBuckets.dueAt(spark, idx, later).count() == nRedelivered)
    // mid-horizon: exactly the rows whose deliver_at has passed
    val mid = new java.sql.Timestamp(now.getTime + 5 * 60 * 1000L)
    val expectMid = redelivered.filter(col(Envelope.DeliverAt) <= lit(mid)).count()
    assert(expectMid > 0 && expectMid < nRedelivered,
      s"mid-horizon should split the backoff schedule, got $expectMid/$nRedelivered")
    // plain count, NOT re-filtered: dueAt already applies the residual
    // deliver_at <= t — re-filtering here would mask a dueAt regression
    // that leaks not-yet-due rows from an already-due bucket
    assert(DelayedBuckets.dueAt(spark, idx, mid).count() == expectMid)
  }

  test("empty delayed index (zero delayed rows) reads as empty, not a crash") {
    val env = graft.model.Envelope.fromEvents(spark, sf001)
    val idx = Files.createTempDirectory("graft-delayed-empty").toString + "/idx"
    // a topic whose backlog has no pending delayed messages — common state
    DelayedBuckets.buildIndex(env.filter(lit(false)), idx)
    val due = DelayedBuckets.dueAt(spark, idx,
      java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    assert(due.count() == 0)
    assert(due.columns.contains("due_bucket"))
  }

  test("late-data split routes pre-watermark rows to the late sink") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("k", "t")
      .withColumn("event_time", timestamp_seconds(col("t")))
    val ckpt = Files.createTempDirectory("graft-late").toString
    val main = scala.collection.mutable.ListBuffer[Long]()
    val late = scala.collection.mutable.ListBuffer[Long]()
    val q = StreamOps.withLateDataSplit(stream, "event_time", 10000L, ckpt,
      mainProcess = b => main ++= b.select("t").as[Long](spark.implicits.newLongEncoder).collect(),
      lateSink = b => late ++= b.select("t").as[Long](spark.implicits.newLongEncoder).collect())
    try {
      input.addData(("a", 1000L), ("a", 2000L)) // watermark -> 2000 - 10 = 1990
      q.processAllAvailable()
      input.addData(("a", 100L), ("a", 2100L))  // 100 is far behind the watermark
      q.processAllAvailable()
      assert(late.contains(100L), s"late=$late main=$main")
      assert(main.contains(2100L) && !main.contains(100L))
    } finally q.stop()
  }
}
