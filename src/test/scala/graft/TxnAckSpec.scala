package graft

import graft.log.{AckLog, TopicLog, Txn}
import graft.model.{Envelope, TopicName}
import graft.streaming.AckState
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Transactional acknowledgment (VERDICT r7 #3; reference
 * pulsar-broker/.../transaction/pendingack/impl/PendingAckHandleImpl.java,
 * pulsar-client-api/.../transaction/Transaction.java:30-93): one txn
 * marker covers the ack of the input AND the produce of the output — the
 * exactly-once consume-process-produce contract.
 */
class TxnAckSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 7}", s"payload-$i", s"prod-${i % 3}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")
      .withColumn(Envelope.RedeliveryCnt, lit(0))

  test("committed txn publishes output AND moves the cursor atomically") {
    val root = Files.createTempDirectory("graft-txnack").toString
    val in = new TopicLog(spark, root, TopicName.parse("in"), 2)
    val out = new TopicLog(spark, root, TopicName.parse("out"), 2)
    in.append(batch(0 until 40))
    val acks = new AckLog(spark, in.name.path(root), "sub-a")

    // consume-process-produce: ack everything read, produce the transform
    val toAck = in.read()
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))
    Txn.begin(root)
      .produce(out, batch(100 until 120))
      .ack(acks, toAck)
      .commit()

    assert(out.read().count() == 20, "output visible after commit")
    assert(acks.read().count() == 40, "acks durable after commit")
    // every partition's cursor is at its high-water (all acked, dense)
    val md = AckState.markDeletePosition(acks.read())
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(md == in.highWater(), "markDelete must reach the high-water")
    assert(AckState.backlog(in.read(), acks.read()).count() == 0)
  }

  test("aborted txn: output invisible, acks released, message redelivers") {
    val root = Files.createTempDirectory("graft-txnack").toString
    val in = new TopicLog(spark, root, TopicName.parse("in"), 2)
    val out = new TopicLog(spark, root, TopicName.parse("out"), 2)
    in.append(batch(0 until 10))
    val acks = new AckLog(spark, in.name.path(root), "sub-a")

    val toAck = in.read().select(col(Envelope.Partition).as("partition"),
      col(Envelope.Offset).as("offset"))
    Txn.begin(root).produce(out, batch(100 until 105)).ack(acks, toAck).abort()

    assert(out.read().count() == 0, "aborted output must be invisible")
    assert(acks.read().count() == 0, "aborted acks must be released")
    // released pending acks redeliver: the unacked-timeout tracker still
    // sees every message as unacked
    val delivered = in.read().select(
      col(Envelope.Partition).as("partition"),
      col(Envelope.Offset).as("offset"),
      lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("delivered_at"))
    val redelivered = AckState.redeliverOnTimeout(in.read(), delivered,
      acks.read(), java.sql.Timestamp.valueOf("2024-01-01 01:00:00"),
      ackTimeoutMs = 60000L)
    assert(redelivered.count() == 10, "every message redelivers after abort")
  }

  test("crash BEFORE marker: neither cursor nor output moves; staged acks are pending, not durable") {
    val root = Files.createTempDirectory("graft-txnack").toString
    val in = new TopicLog(spark, root, TopicName.parse("in"), 2)
    val out = new TopicLog(spark, root, TopicName.parse("out"), 2)
    in.append(batch(0 until 12))
    val acks = new AckLog(spark, in.name.path(root), "sub-a")

    // phase 1 only (what Txn.commit runs before the marker), then "crash"
    val stagedOut = out.stageAppend(batch(100 until 106))
    val stagedAck = acks.stageAck(in.read().limit(6)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset")))
    assert(stagedOut.count == 6 && stagedAck.count == 6)
    assert(out.read().count() == 0, "staged output invisible before marker")
    assert(acks.read().count() == 0, "staged acks invisible before marker")
    assert(acks.pendingAcks().count() == 6,
      "staged acks ARE the pending set (PendingAckHandle in-flight view)")
    // recovery of a marker-less crash changes nothing
    assert(Txn.recover(root) == 0)
    assert(out.read().count() == 0 && acks.read().count() == 0)
  }

  test("crash AFTER marker: recover publishes output and acks together") {
    val root = Files.createTempDirectory("graft-txnack").toString
    val in = new TopicLog(spark, root, TopicName.parse("in"), 2)
    val out = new TopicLog(spark, root, TopicName.parse("out"), 2)
    in.append(batch(0 until 12))
    val acks = new AckLog(spark, in.name.path(root), "sub-a")

    // phase 1 + phase 2 (marker written in Txn.commit's exact format),
    // then "crash" before phase 3's publishes
    val stagedOut = out.stageAppend(batch(100 until 106))
    val stagedAck = acks.stageAck(in.read()
      .filter(col(Envelope.Offset) <= 2)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset")))
    val markerDir = Paths.get(root, "_txn")
    Files.createDirectories(markerDir)
    val lines = Seq(
      Seq(out.name.path(root), stagedOut.epoch.toString, stagedOut.count.toString,
        stagedOut.manifestLines.replace("\n", ";")).mkString("\t"),
      Seq(acks.basePath, stagedAck.epoch.toString, stagedAck.count.toString,
        stagedAck.manifestLines.replace("\n", ";")).mkString("\t"))
    val tmp = markerDir.resolve("txn-test.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes)
    Files.move(tmp, markerDir.resolve("txn-test.committed"),
      StandardCopyOption.ATOMIC_MOVE)

    assert(Txn.recover(root) > 0)
    assert(out.read().count() == 6, "recovered output visible")
    assert(acks.read().count() == stagedAck.count,
      "recovered acks durable — cursor and output moved TOGETHER")
    assert(acks.pendingAcks().count() == 0, "nothing left pending")
    // idempotent: a second recovery (another process racing) is a no-op
    Txn.recover(root): Unit
    assert(out.read().count() == 6 && acks.read().count() == stagedAck.count)
  }

  test("end-to-end exactly-once step through Txn.commit with both legs") {
    val root = Files.createTempDirectory("graft-txnack").toString
    val in = new TopicLog(spark, root, TopicName.parse("in"), 2)
    val out = new TopicLog(spark, root, TopicName.parse("out"), 2)
    in.append(batch(0 until 30))
    val acks = new AckLog(spark, in.name.path(root), "sub-a")

    // step 1: process offsets 0..9 per partition
    val step1 = in.read().filter(col(Envelope.Offset) < 10)
    Txn.begin(root)
      .produce(out, step1.drop(Envelope.Topic, Envelope.Partition, Envelope.Offset))
      .ack(acks, step1.select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset")))
      .commit()
    val md1 = AckState.markDeletePosition(acks.read())
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // key-hash routing is uneven: a partition with fewer than 10 rows has
    // its whole range acked, so the cursor sits at its high-water
    val want1 = in.highWater().map { case (p, o) => p -> math.min(9L, o) }
    assert(md1 == want1, s"cursor at min(9, hw) per partition, got $md1")

    // step 2: the REST — two txn acks to the same AckLog in one txn
    // (union path) plus a second produce
    val rest = in.read().filter(col(Envelope.Offset) >= 10)
    val restAcks = rest.select(col(Envelope.Partition).as("partition"),
      col(Envelope.Offset).as("offset"))
    Txn.begin(root)
      .produce(out, rest.drop(Envelope.Topic, Envelope.Partition, Envelope.Offset))
      .ack(acks, restAcks.filter(col("offset") % 2 === 0))
      .ack(acks, restAcks.filter(col("offset") % 2 === 1))
      .commit()
    assert(out.read().count() == 30)
    assert(AckState.backlog(in.read(), acks.read()).count() == 0,
      "no backlog once every offset is acked")
    val md2 = AckState.markDeletePosition(acks.read())
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(md2 == in.highWater())
  }
}
