package graft

import graft.model.Envelope
import graft.operators.{Compaction, Dedup, Dispatch, Windows}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics specs for compaction / dedup / dispatch, transliterated from
  * the reference's representative tests (SURVEY.md §5):
  * CompactionTest.java, BrokerMessageDeduplicationTest.java,
  * DelayedDeliveryTest.java. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  /** tiny hand-built log: (key, value, offset, event_time_sec, producer, seq) */
  private def mkLog(rows: Seq[(String, String, Long, Long, String, Long)]): DataFrame =
    rows.toDF(Envelope.Key, Envelope.Value, Envelope.Offset, "ets",
        Envelope.ProducerName, Envelope.SequenceId)
      .withColumn(Envelope.EventTime, timestamp_seconds(col("ets")))
      .withColumn(Envelope.Partition, lit(0))
      .drop("ets")

  test("compaction keeps last value per key in publish order (CompactionTest LWW)") {
    val log = mkLog(Seq(
      ("k1", "v1", 0L, 10L, "p0", 0L),
      ("k2", "a", 1L, 11L, "p0", 1L),
      ("k1", "v2", 2L, 9L, "p0", 2L),   // later offset, earlier event time
      ("k2", "b", 3L, 12L, "p0", 3L)))
    val got = Compaction.publishOrder(log)
      .select(Envelope.Key, Envelope.Value).as[(String, String)].collect().toMap
    assert(got == Map("k1" -> "v2", "k2" -> "b"))
  }

  test("compaction tombstone (null value) removes the key") {
    val log = mkLog(Seq(
      ("k1", "v1", 0L, 10L, "p0", 0L),
      ("k1", null, 1L, 11L, "p0", 1L),
      ("k2", "x", 2L, 12L, "p0", 2L)))
    val got = Compaction.publishOrder(log).select(Envelope.Key)
      .as[String].collect().toSet
    assert(got == Set("k2"))
  }

  test("compaction null-key rows: dropped by default, passed through UNCOMPACTED when retained") {
    val log = mkLog(Seq(
      ("k1", "v1", 0L, 10L, "p0", 0L),
      (null, "n1", 1L, 11L, "p0", 1L),
      (null, "n2", 2L, 12L, "p0", 2L),
      ("k1", "v2", 3L, 13L, "p0", 3L)))
    // default = reference topicCompactionRetainNullKey=false: dropped
    val dropped = Compaction.publishOrder(log)
      .select(Envelope.Key, Envelope.Value).as[(String, String)].collect().toSet
    assert(dropped == Set(("k1", "v2")))
    // retained: BOTH null-key rows survive as-is (never last-per-null-group)
    val kept = Compaction.compact(log, Envelope.Key, Seq(col(Envelope.Offset)),
        Envelope.Value, retainNullKey = true)
      .select(Envelope.Value).as[String].collect().toSet
    assert(kept == Set("v2", "n1", "n2"))
  }

  test("event-time compaction keeps max event_time, offset tie-break") {
    val log = mkLog(Seq(
      ("k1", "old", 0L, 100L, "p0", 0L),
      ("k1", "newer-event-time", 1L, 200L, "p0", 1L),
      ("k1", "late-arrival-older-event", 2L, 150L, "p0", 2L),
      ("k2", "t1", 3L, 50L, "p0", 3L),
      ("k2", "t2", 4L, 50L, "p0", 4L))) // equal event time -> higher offset
    val got = Compaction.eventTimeOrder(log)
      .select(Envelope.Key, Envelope.Value).as[(String, String)].collect().toMap
    assert(got == Map("k1" -> "newer-event-time", "k2" -> "t2"))
  }

  test("dedup drops duplicate and regressed sequence ids per producer") {
    val log = mkLog(Seq(
      ("k", "a", 0L, 0L, "p1", 0L),
      ("k", "b", 1L, 0L, "p1", 1L),
      ("k", "b-dup", 2L, 0L, "p1", 1L),   // duplicate seq -> dropped
      ("k", "regress", 3L, 0L, "p1", 0L), // lower seq -> dropped
      ("k", "c", 4L, 0L, "p1", 2L),
      ("k", "other", 5L, 0L, "p2", 0L)))  // different producer unaffected
    val kept = Dedup.dedupBatch(log).select(Envelope.Value)
      .as[String].collect().toSet
    assert(kept == Set("a", "b", "c", "other"))
  }

  test("dedup is idempotent and preserves strictly-increasing streams") {
    val clean = mkLog((0L until 50L).map(i => ("k", s"v$i", i, 0L, "p", i)))
    assert(Dedup.dedupBatch(clean).count() == 50)
    val once = Dedup.dedupBatch(Dedup.dedupBatch(clean))
    assert(once.count() == 50)
  }

  test("dedupAppend drops batch rows at/below committed high-water state") {
    val state = Seq(("p1", 10L)).toDF(Envelope.ProducerName, "highest_sequence_pushed")
    val batch = mkLog(Seq(
      ("k", "old", 100L, 0L, "p1", 9L),
      ("k", "dup-hw", 101L, 0L, "p1", 10L),
      ("k", "new", 102L, 0L, "p1", 11L),
      ("k", "fresh-producer", 103L, 0L, "p9", 0L)))
    val kept = Dedup.dedupAppend(batch, state).select(Envelope.Value)
      .as[String].collect().toSet
    assert(kept == Set("new", "fresh-producer"))
  }

  test("delayed delivery: due/scheduled split is a partition of the log") {
    val env = Envelope.fromEvents(spark, sf001)
    val t = lit("2024-01-15 00:00:00").cast("timestamp")
    val due = Dispatch.dueMessages(env, t).count()
    val sched = Dispatch.scheduledAfter(env, t).count()
    assert(due + sched == env.count())
    // every due row's deliver_at <= t
    assert(Dispatch.dueMessages(env, t)
      .filter(col(Envelope.DeliverAt) > t).count() == 0)
  }

  test("DLQ routing: rows over maxRedeliverCount go to DLQ, others carry backoff") {
    val env = Envelope.fromEvents(spark, sf001)
    val routed = Dispatch.dlqRoute(env, "s", maxRedeliverCount = 3)
    val dlq = routed.filter(col("route_topic").endsWith("-DLQ"))
    val retry = routed.filter(col("route_topic").endsWith("-RETRY"))
    // dead-letter at >= maxRedeliverCount (reference possibleToDeadLetter)
    assert(dlq.filter(col(Envelope.RedeliveryCnt) < 3).count() == 0)
    assert(retry.filter(col(Envelope.RedeliveryCnt) >= 3).count() == 0)
    assert(retry.filter(col("next_deliver_at").isNull).count() == 0)
    assert(dlq.count() + retry.count() == env.count())
  }

  test("Key_Shared sticky ranges route each key to exactly one consumer") {
    val env = Envelope.fromEvents(spark, sf001)
    val routed = Dispatch.keySharedSticky(env,
      Seq((0, 32767, "c1"), (32768, 65535, "c2")))
    assert(routed.filter(col("consumer_id").isNull).count() == 0)
    // a key always lands on the same consumer
    val multi = routed.groupBy(Envelope.Key)
      .agg(countDistinct("consumer_id").as("n")).filter(col("n") > 1)
    assert(multi.count() == 0)
  }

  test("consistent-hash ring: total assignment, per-key stability, minimal movement on churn") {
    val env = Envelope.fromEvents(spark, sf001)
    val c3 = Seq("c1", "c2", "c3")
    val a3 = Dispatch.keySharedConsistentHash(env, c3)
    assert(a3.filter(col("consumer_id").isNull).count() == 0)
    assert(a3.select("consumer_id").distinct().count() >= 2)
    // per-key stickiness
    assert(a3.groupBy(Envelope.Key).agg(countDistinct("consumer_id").as("n"))
      .filter(col("n") > 1).count() == 0)
    // minimal movement: dropping c3 must not move any key that was on c1/c2
    val a2 = Dispatch.keySharedConsistentHash(env, Seq("c1", "c2"))
    val moved = a3.select(col(Envelope.Key), col("consumer_id").as("before"))
      .distinct()
      .join(a2.select(col(Envelope.Key), col("consumer_id").as("after")).distinct(),
        Seq(Envelope.Key))
      .filter(col("before") =!= "c3" && col("before") =!= col("after"))
    assert(moved.count() == 0,
      "keys not owned by the leaving consumer must stay put")
  }

  test("AUTO_SPLIT hash-range: split-biggest-in-half layout, joiner takes the lower half") {
    val env = Envelope.fromEvents(spark, sf001)
    // hand-traced reference layout for join order c1..c4:
    // c3 [0,16384], c2 (16384,32768], c4 (32768,49152], c1 (49152,65535]
    val got4 = Dispatch.keySharedAutoSplit(env, Seq("c1", "c2", "c3", "c4"))
      .groupBy("consumer_id")
      .agg(min("slot").as("lo"), max("slot").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got4("c3")._2 <= 16384 && got4("c2")._1 > 16384 &&
      got4("c2")._2 <= 32768 && got4("c4")._1 > 32768 &&
      got4("c4")._2 <= 49152 && got4("c1")._1 > 49152, got4.toString)
    // n=3: c3 [0,16384], c2 (16384,32768], c1 (32768,65535]
    val got3 = Dispatch.keySharedAutoSplit(env, Seq("c1", "c2", "c3"))
      .groupBy("consumer_id")
      .agg(min("slot").as("lo"), max("slot").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got3("c3")._2 <= 16384 && got3("c2")._1 > 16384 &&
      got3("c2")._2 <= 32768 && got3("c1")._1 > 32768, got3.toString)
    // total assignment: every row routed, per-key sticky
    val a = Dispatch.keySharedAutoSplit(env, Seq("c1", "c2", "c3"))
    assert(a.filter(col("consumer_id").isNull).count() == 0)
    assert(a.groupBy(Envelope.Key).agg(countDistinct("consumer_id").as("n"))
      .filter(col("n") > 1).count() == 0)
  }

  test("AUTO_SPLIT with rangeSize > 65536 assigns every slot (owner table sized to the range)") {
    val env = Envelope.fromEvents(spark, sf001)
    val a = Dispatch.keySharedAutoSplit(env, Seq("c1", "c2", "c3"),
      rangeSize = 1 << 17)
    // a 65536-sized owner table would element_at -> silent NULL for every
    // slot >= 65536 (about half the rows at 2^17)
    assert(a.filter(col("consumer_id").isNull).count() == 0)
    assert(a.filter(col("slot") >= 65536).count() > 0,
      "fixture never exercised the extended slot range")
    // per-key sticky still holds over the wider ring
    assert(a.groupBy(Envelope.Key).agg(countDistinct("consumer_id").as("n"))
      .filter(col("n") > 1).count() == 0)
    // the literal-table bound stays a loud error, not an OOM
    intercept[IllegalArgumentException] {
      Dispatch.keySharedAutoSplit(env, Seq("c1"), rangeSize = 1 << 21)
        .count()
    }: Unit
  }

  test("shared priority dispatch reproduces the reference permit-cycle order") {
    import spark.implicits._
    // the documented example (ConsumerBuilder.java:543-548): dispatch
    // order C1,C2,C3,C1,C4,C5,C4 for these (priority, permits)
    val log = (0L until 14L).map(o => (0, o, s"k$o"))
      .toDF(Envelope.Partition, Envelope.Offset, Envelope.Key)
    val got = Dispatch.sharedPriorityDispatch(log,
        Seq(("c1", 0, 2), ("c2", 0, 1), ("c3", 0, 1), ("c4", 1, 2), ("c5", 1, 1)))
      .orderBy(Envelope.Offset)
      .select("consumer_id").as[String].collect().toSeq
    val cycle = Seq("c1", "c2", "c3", "c1", "c4", "c5", "c4")
    assert(got == cycle ++ cycle)
  }

  test("failover active consumer: only the top-priority tier serves, spread by name order") {
    val env = Envelope.fromEvents(spark, sf001)
    val routed = Dispatch.failoverActiveConsumer(env,
      Seq(("standby", 5), ("b", 0), ("a", 0)))
    // tier = {a, b} sorted; 4 partitions -> a,b,a,b; standby gets nothing
    val m = routed.select(Envelope.Partition, "consumer_id").distinct()
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m == Map(0 -> "a", 1 -> "b", 2 -> "a", 3 -> "b"))
  }

  test("ring assignment is independent of the consumer-list input order (tie-break on owner)") {
    val env = Envelope.fromEvents(spark, sf001)
    val fwd = Dispatch.keySharedConsistentHash(env, Seq("c1", "c2", "c3"))
      .select(col(Envelope.Key), col("consumer_id")).distinct()
    val rev = Dispatch.keySharedConsistentHash(env, Seq("c3", "c1", "c2"))
      .select(col(Envelope.Key), col("consumer_id").as("rev_id")).distinct()
    val diff = fwd.join(rev, Seq(Envelope.Key))
      .filter(col("consumer_id") =!= col("rev_id"))
    assert(diff.count() == 0,
      "a shuffled consumer list must produce the identical assignment")
  }

  test("rebalance: adding a consumer moves keys ONLY to the joiner; draining holds in-flight rows") {
    val env = Envelope.fromEvents(spark, sf001)
    val reb = Dispatch.keySharedRebalance(env,
      oldConsumers = Seq("c1", "c2", "c3"),
      newConsumers = Seq("c1", "c2", "c3", "c4")).cache()
    // minimal movement on ADD: every moved key lands on the joining
    // consumer — no lateral movement between surviving consumers
    assert(reb.filter(col("moved") && col("consumer_after") =!= "c4").count() == 0)
    // something actually moved (the joiner took ring segments)
    val movedCount = reb.filter(col("moved")).count()
    assert(movedCount > 0)
    // and not too much: expected share is ~1/4 of traffic
    assert(movedCount < reb.count() / 2, "movement should be bounded")
    // with no drain cursor, effective route == post-change ring
    assert(reb.filter(col("consumer_id") =!= col("consumer_after")).count() == 0)
    reb.unpersist()

    // draining: rows on moved slots at/below the cursor stay with the old
    // owner (in flight there), later offsets go to the new owner — so the
    // new owner never sees an offset <= one still owned by the old owner,
    // which is exactly the per-key order guarantee during churn
    val cursor = env.groupBy(Envelope.Partition)
      .agg(expr(s"percentile_approx(${Envelope.Offset}, 0.5)").cast("long").as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val drain = Dispatch.keySharedRebalance(env,
      oldConsumers = Seq("c1", "c2", "c3"),
      newConsumers = Seq("c1", "c2", "c3", "c4"),
      drainedUpTo = cursor).cache()
    val wrongHold = drain.filter(col("moved") &&
      col(Envelope.Offset) <= element_at(
        typedLit(cursor.map { case (p, o) => p -> o }), col(Envelope.Partition)) &&
      col("consumer_id") =!= col("consumer_before"))
    assert(wrongHold.count() == 0, "in-flight rows must stay with the old owner")
    val wrongNew = drain.filter(col("moved") &&
      col(Envelope.Offset) > element_at(
        typedLit(cursor.map { case (p, o) => p -> o }), col(Envelope.Partition)) &&
      col("consumer_id") =!= col("consumer_after"))
    assert(wrongNew.count() == 0, "post-drain rows must route to the new owner")
    // unmoved keys are untouched by draining
    assert(drain.filter(!col("moved") &&
      col("consumer_id") =!= col("consumer_before")).count() == 0)
    drain.unpersist()
  }

  test("count windows (batch): only full windows fire, in arrival order") {
    val log = mkLog((0L until 25L).map(i => ("k", s"v$i", i, 0L, "p", i)))
      .withColumn("metric_value", col(Envelope.Offset).cast("double"))
    val fired = Windows.countTumblingBatch(log, Envelope.Key, Envelope.Offset,
        10, Seq(sum("metric_value").as("s"), max(Envelope.Offset).as("mx")))
    val rows = fired.orderBy("window_id")
      .select("window_id", "s", "mx").as[(Long, Double, Long)].collect()
    // 25 rows -> two full windows of 10; trailing 5 not fired
    assert(rows.toSeq == Seq((0L, 45.0, 9L), (1L, 145.0, 19L)))
  }
}
