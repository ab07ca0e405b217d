package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.streaming.{BatchReceivePolicy, Subscription, SubscriptionType, TokenBucket}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * Token-bucket dispatch rate limiting (VERDICT r7 #4; reference
 * pulsar-broker/.../qos/AsyncTokenBucket.java "consistent rate"
 * contract): deterministic property replay on the pure state machine +
 * a wired consumer-loop twin.
 */
class RateLimiterSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // nanos per second

  test("property: over ANY window, granted ≤ rate·Δt + capacity (seeded replay)") {
    val rnd = new scala.util.Random(42)
    val rate = 1000.0
    val cap = 500L
    var bucket = TokenBucket.full(rate, cap, 0L)
    var now = 0L
    val events = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (t, granted)
    (1 to 2000).foreach { _ =>
      now += rnd.nextInt(20000000) // 0..20ms steps
      val demand = rnd.nextInt(400).toLong
      val (b, granted) = bucket.acquire(demand, now)
      bucket = b
      assert(granted <= demand && granted <= cap)
      assert(b.tokens >= 0.0 && b.tokens <= cap.toDouble, s"tokens out of [0,cap]: ${b.tokens}")
      events += ((now, granted))
    }
    // the consistent-rate bound on a sample of windows, including the
    // full run and short bursts
    val ts = events.map(_._1)
    for (w <- Seq(50000000L, S, 5 * S, ts.last)) {
      var i = 0
      while (i < events.size) {
        val t1 = events(i)._1
        val inWindow = events.filter { case (t, _) => t >= t1 && t < t1 + w }
        val granted = inWindow.map(_._2).sum
        val bound = rate * (w.toDouble / S) + cap
        assert(granted <= bound + 1e-6,
          s"window [$t1, ${t1 + w}): granted $granted > bound $bound")
        i += 173 // sample windows, not all O(n²)
      }
    }
  }

  test("property: sustained demand converges to the configured rate") {
    val rate = 2000.0
    val cap = 100L
    var bucket = TokenBucket.full(rate, cap, 0L)
    var now = 0L
    var total = 0L
    // saturating demand every 1ms for 10 simulated seconds
    (1 to 10000).foreach { _ =>
      now += 1000000L
      val (b, granted) = bucket.acquire(Long.MaxValue / 4, now)
      bucket = b
      total += granted
    }
    val expected = rate * 10 + cap // rate·T plus the initial burst credit
    assert(total <= expected + 1,
      s"long-run total $total exceeds rate bound $expected")
    assert(total >= rate * 10 * 0.99,
      s"long-run total $total starved below the configured rate")
  }

  test("burst credit: an idle bucket grants exactly capacity instantly, then throttles") {
    var bucket = TokenBucket.full(500.0, 200L, 0L)
    val (b1, g1) = bucket.acquire(10000L, 0L)
    assert(g1 == 200L, "first grant is the full burst capacity")
    val (_, g2) = b1.acquire(10000L, 0L)
    assert(g2 == 0L, "no tokens until time passes")
    // after 100ms at 500/s: 50 tokens
    val (_, g3) = b1.acquire(10000L, 100000000L)
    assert(g3 == 50L)
    assert(b1.budget(100000000L) == 50L, "budget() previews the same grant")
  }

  test("dual-dimension throttle: the BYTE bucket binds when messages are unlimited") {
    val root = Files.createTempDirectory("graft-rate").toString
    val log = new TopicLog(spark, root, TopicName.parse("rated-b"), 2)
    val rows = (0 until 300).map(i =>
        (s"u${i % 7}", s"v-$i", "p", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")
    log.append(rows)
    // total payload octets (value + key), the admission meter's definition
    val totalOctets = log.read().agg(
      sum(octet_length(col(Envelope.Value)) + octet_length(col(Envelope.Key))))
      .head().getLong(0)
    val burst = 800L
    val byteRate = 2000.0
    val sub = new Subscription(log, "rated-b-sub", SubscriptionType.Exclusive,
      Files.createTempDirectory("graft-rate-ckpt").toString,
      policy = BatchReceivePolicy(maxFilesPerTrigger = Some(1)))
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val t0 = System.nanoTime()
    val q = sub.consumeRateLimitedDual(msgs = None,
      bytes = Some((byteRate, burst))) { (batch, _) =>
        seen.addAndGet(batch.count()): Unit
    }
    try q.processAllAvailable() finally q.stop()
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(seen.get() == 300, s"dispatched ${seen.get()} of 300")
    val minSec = (totalOctets - burst) / byteRate
    assert(elapsedSec >= minSec,
      f"$totalOctets octets at $byteRate%.0f B/s burst $burst finished in " +
        f"$elapsedSec%.2f s < $minSec%.2f s — byte rate not enforced")
  }

  test("wired consumer loop: rows exact-once AND wall time respects the rate") {
    val root = Files.createTempDirectory("graft-rate").toString
    val log = new TopicLog(spark, root, TopicName.parse("rated"), 2)
    val rows = (0 until 300).map(i =>
        (s"u${i % 7}", s"v-$i", "p", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")
    log.append(rows)

    val sub = new Subscription(log, "rated-sub", SubscriptionType.Exclusive,
      Files.createTempDirectory("graft-rate-ckpt").toString,
      policy = BatchReceivePolicy(maxFilesPerTrigger = Some(1)))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val t0 = System.nanoTime()
    // 300 rows at 400 msg/s with burst 100 → at least (300-100)/400 = 0.5 s
    val q = sub.consumeRateLimited(rateMsgsPerSec = 400.0, burst = 100L) {
      (batch, _) =>
        batch.select(Envelope.Partition, Envelope.Offset).collect()
          .foreach(r => seen.add((r.getInt(0), r.getLong(1)))): Unit
    }
    try q.processAllAvailable() finally q.stop()
    val elapsedSec = (System.nanoTime() - t0) / 1e9

    import scala.collection.JavaConverters._
    val got = seen.iterator().asScala.toSeq
    assert(got.size == 300, s"dispatched ${got.size} of 300")
    assert(got.distinct.size == 300, "no duplicate dispatch")
    assert(elapsedSec >= 0.5,
      f"300 rows at 400/s with burst 100 finished in $elapsedSec%.2f s — rate not enforced")
  }

  test("debt discipline: oversized batch drives the balance negative; the debt extends the pause") {
    val bucket = TokenBucket.full(1000.0, 500L, 0L)
    val (b1, ok1) = bucket.consumeAndCheck(800L, 0L)
    assert(!ok1, "no tokens remain after an oversized consume")
    assert(b1.tokens == -300.0, "whole batch consumed — 300 tokens of debt")
    // calculateThrottlingDuration: need = 1 - (-300) = 301 tokens at
    // 1000/s → 301 ms (negative balance ADDS to the need,
    // AsyncTokenBucket.java:270-272)
    assert(b1.throttleNanos(0L) == 301000000L)
    // after the pause the balance is back to +1 and dispatch resumes
    val (_, ok2) = b1.consumeAndCheck(0L, 301000000L)
    assert(ok2, "tokens available exactly after the computed pause")
    // a batch within balance leaves tokens and no pause
    val (b2, ok3) = bucket.consumeAndCheck(499L, 0L)
    assert(ok3 && b2.throttleNanos(0L) == 0L)
  }

  test("property: debt discipline bounded by rate·Δt + capacity + one batch over ANY window") {
    val rnd = new scala.util.Random(7)
    val rate = 1000.0
    val cap = 500L
    val maxBatch = 400L
    var bucket = TokenBucket.full(rate, cap, 0L)
    var now = 0L
    val events = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var total = 0L
    (1 to 4000).foreach { _ =>
      now += rnd.nextInt(20000000)
      // the dispatcher's loop: only dispatch when tokens remain
      // (containsTokens), then the WHOLE batch consumes
      if (bucket.throttleNanos(now) == 0L) {
        val demand = 1L + rnd.nextInt(maxBatch.toInt).toLong
        val (b, _) = bucket.consumeAndCheck(demand, now)
        bucket = b
        events += ((now, demand))
        total += demand
      }
    }
    val ts = events.map(_._1)
    for (w <- Seq(50000000L, S, 5 * S, ts.last)) {
      var i = 0
      while (i < events.size) {
        val t1 = events(i)._1
        val granted = events.filter { case (t, _) => t >= t1 && t < t1 + w }
          .map(_._2).sum
        // one batch of overshoot on top of the admission bound — the
        // price of unsplittable dispatch batches
        val bound = rate * (w.toDouble / S) + cap + maxBatch
        assert(granted <= bound + 1e-6,
          s"window [$t1, ${t1 + w}): granted $granted > bound $bound")
        i += 197
      }
    }
    // sustained-demand convergence: same long-run rate as admission mode
    val wallSec = now.toDouble / S
    assert(total <= rate * wallSec + cap + maxBatch + 1)
    assert(total >= rate * wallSec * 0.98,
      s"debt discipline starved: $total over $wallSec s at rate $rate")
  }

  test("wired debt loop: dispatch-first, exact-once, wall time respects the rate") {
    val root = Files.createTempDirectory("graft-rate").toString
    val log = new TopicLog(spark, root, TopicName.parse("rated-d"), 2)
    val rows = (0 until 300).map(i =>
        (s"u${i % 7}", s"v-$i", "p", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")
    log.append(rows)

    val sub = new Subscription(log, "rated-d-sub", SubscriptionType.Exclusive,
      Files.createTempDirectory("graft-rate-ckpt").toString,
      policy = BatchReceivePolicy(maxFilesPerTrigger = Some(1)))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val t0 = System.nanoTime()
    // 300 rows at 400 msg/s, burst 100: the LAST batch dispatches before
    // paying its debt, so the floor relaxes by one batch (≤ the largest
    // per-trigger file) vs admission mode
    val q = sub.consumeRateLimitedDebt(msgs = Some((400.0, 100L)),
      bytes = None) { (batch, _) =>
        batch.select(Envelope.Partition, Envelope.Offset).collect()
          .foreach(r => seen.add((r.getInt(0), r.getLong(1)))): Unit
    }
    try q.processAllAvailable() finally q.stop()
    val elapsedSec = (System.nanoTime() - t0) / 1e9

    import scala.collection.JavaConverters._
    val got = seen.iterator().asScala.toSeq
    assert(got.size == 300, s"dispatched ${got.size} of 300")
    assert(got.distinct.size == 300, "no duplicate dispatch")
    // per-partition epoch files bound a batch by ~half the log here; be
    // conservative: all but burst + one max-size batch must be paced
    val maxBatchRows = 150L
    val minSec = (300L - 100L - maxBatchRows).toDouble / 400.0
    assert(elapsedSec >= minSec,
      f"300 rows at 400/s burst 100 (debt) finished in $elapsedSec%.2f s < $minSec%.2f s")
  }
}
