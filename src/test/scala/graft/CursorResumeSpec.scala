package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.streaming.{Functions, StreamOps, Subscription, SubscriptionType}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Durable-cursor semantics: a subscription resumes from its checkpoint
  * (no re-delivery of acked messages, no loss of new ones) — the
  * markDelete cursor contract (§1.1). */
class CursorResumeSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Range) =
    ids.map(i => (s"k${i % 3}", s"v$i", "p", i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName, Envelope.SequenceId)
      .withColumn(Envelope.PublishTime,
        timestamp_seconds(col(Envelope.SequenceId) + 1700000000L))

  test("subscription cursor survives restart: each message delivered exactly once") {
    val root = Files.createTempDirectory("graft-cursor").toString
    val tl = new TopicLog(spark, root, TopicName.parse("cur-topic"), 2)
    tl.append(batch(0 until 50))

    val sub = new Subscription(tl, "durable-sub", SubscriptionType.Exclusive,
      checkpointRoot = s"$root/_cursors")
    val delivered = scala.collection.mutable.ListBuffer[String]()
    val q1 = sub.consume { (mb, _) =>
      delivered ++= mb.select(Envelope.Value).as[String](spark.implicits.newStringEncoder).collect()
    }
    q1.awaitTermination(60000)
    assert(delivered.size == 50)

    // new data lands while the consumer is down
    tl.append(batch(50 until 80))

    // restart with the SAME subscription name -> same cursor
    val q2 = sub.consume { (mb, _) =>
      delivered ++= mb.select(Envelope.Value).as[String](spark.implicits.newStringEncoder).collect()
    }
    q2.awaitTermination(60000)
    assert(delivered.size == 80, s"resume must not redeliver or drop: ${delivered.size}")
    assert(delivered.distinct.size == 80, "every message exactly once")

    // a DIFFERENT subscription has its own cursor and reads from the start
    val sub2 = new Subscription(tl, "fresh-sub", SubscriptionType.Exclusive,
      checkpointRoot = s"$root/_cursors")
    var fresh = 0L
    val q3 = sub2.consume { (mb, _) => fresh += mb.count() }
    q3.awaitTermination(60000)
    assert(fresh == 80, "independent subscription replays the full log")
  }

  test("effectively-once function pipeline dedups duplicate produces at the sink") {
    val root = Files.createTempDirectory("graft-eff1").toString
    val tl = new TopicLog(spark, root, TopicName.parse("eff-topic"), 1)
    // the producer retried: same (producer, seq) appended twice
    tl.append(batch(0 until 20))
    tl.append(batch(0 until 20))
    assert(tl.read().count() == 40)

    val sub = new Subscription(tl, "eff-sub", SubscriptionType.Exclusive,
      checkpointRoot = s"$root/_cursors")
    val sinkPath = s"$root/sink"
    val q = Functions.run(
      sub.stream(),
      transform = df => df.select(Envelope.ProducerName, Envelope.SequenceId,
        Envelope.PublishTime, Envelope.Value),
      sinkPath = sinkPath,
      checkpoint = s"$root/fn-ckpt",
      guarantee = Functions.Guarantee.EffectivelyOnce)
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(sinkPath)
    assert(out.count() == 20, s"retried produces must collapse: ${out.count()}")
    assert(out.select(Envelope.SequenceId).distinct().count() == 20)
  }

  test("at-most-once: acked-but-unprocessed batch is dropped on replay, never duplicated") {
    val root = Files.createTempDirectory("graft-amo").toString
    val tl = new TopicLog(spark, root, TopicName.parse("amo-topic"), 1)
    tl.append(batch(0 until 30))

    val sub = new Subscription(tl, "amo-sub", SubscriptionType.Exclusive,
      checkpointRoot = s"$root/_cursors")
    val sinkPath = s"$root/sink"
    val ckpt = s"$root/fn-ckpt"
    def runOnce(): Unit = {
      val q = Functions.run(sub.stream(),
        transform = df => df.select(Envelope.ProducerName, Envelope.SequenceId,
          Envelope.Value),
        sinkPath = sinkPath, checkpoint = ckpt,
        guarantee = Functions.Guarantee.AtMostOnce)
      q.processAllAvailable(); q.stop()
    }
    // happy path: batch 0 acked then processed
    runOnce()
    assert(spark.read.parquet(sinkPath).count() == 30)

    // crash window: epoch 1 was ACKED by a consumer that died before
    // processing — simulate by pre-writing its ack marker; the replayed
    // batch must be dropped (lost), not reprocessed
    tl.append(batch(30 until 50))
    val ackDir = java.nio.file.Paths.get(ckpt, "_acks")
    java.nio.file.Files.createDirectories(ackDir)
    java.nio.file.Files.write(ackDir.resolve("1.acked"), Array.emptyByteArray)
    runOnce()
    assert(spark.read.parquet(sinkPath).count() == 30,
      "acked-but-unprocessed batch must be lost, not replayed")

    // subsequent batches process normally, exactly once
    tl.append(batch(50 until 60))
    runOnce()
    val vals = spark.read.parquet(sinkPath)
      .select(Envelope.Value).as[String](spark.implicits.newStringEncoder)
      .collect().toSeq
    assert(vals.size == 40, s"30 + 10 (epoch-1 rows lost): ${vals.size}")
    assert(vals.distinct.size == 40, "nothing delivered twice")
  }
}
