package graft

import graft.log.{AckLog, TopicLog, Txn}
import graft.model.{Envelope, TopicName}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Seeded crash-point fuzzing of the transaction protocol: every
 * scenario stages a two-topic + one-ack-log transaction, "crashes" it
 * at a random phase (before the marker / at the marker / after a
 * PARTIAL publish / fully published), sometimes leaves an extra
 * abandoned staged epoch behind, then runs the janitor
 * ([[Txn.vacuumAll]] = recover + sweep) from one hour in the future
 * and asserts the protocol's two invariants:
 *
 *  - ATOMICITY: after the janitor, either EVERY leg of the txn is
 *    visible with exact row counts (marker was written) or NO leg is
 *    (it wasn't) — never partial visibility;
 *  - HYGIENE: no uncommitted staging survives the sweep, committed
 *    rows are never lost, and a second sweep is a no-op.
 *
 * The reference's analog guarantees come from the transaction buffer's
 * commit marker + the coordinator's timeout abort; here the marker file
 * is the single commit point and the janitor the timeout half. Seeds
 * are fixed, so a failure replays deterministically.
 */
class TxnProtocolFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 5}", s"payload-$i", s"prod-${i % 2}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")
      .withColumn(Envelope.RedeliveryCnt, lit(0))

  test("20 seeded crash scenarios: all-or-nothing after the janitor, always") {
    (0 until 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val root = Files.createTempDirectory(s"graft-txnfuzz-$seed").toString
      val tA = new TopicLog(spark, root, TopicName.parse("fa"), 2)
      val tB = new TopicLog(spark, root, TopicName.parse("fb"), 2)
      tB.append(batch(0 until 10)): Unit // pre-existing committed rows
      val acks = new AckLog(spark, tB.name.path(root), "sub-f")

      val nA = 3 + rnd.nextInt(5)
      val nB = 2 + rnd.nextInt(4)
      val nAck = 1 + rnd.nextInt(5)

      // phase 1: stage (what Txn.commit does before the marker)
      val sA = tA.stageAppend(batch(100 until (100 + nA)))
      val sB = tB.stageAppend(batch(200 until (200 + nB)))
      val sAck = acks.stageAck(tB.read().limit(nAck)
        .select(col(Envelope.Partition).as("partition"),
          col(Envelope.Offset).as("offset")))

      // crash phase: 0 = before marker; 1 = marker written, nothing
      // published; 2 = marker + one random leg published; 3 = fully
      // published (clean commit, janitor must be a no-op on it)
      val phase = rnd.nextInt(4)
      val markerWritten = phase >= 1
      if (markerWritten) {
        val markerDir = Paths.get(root, "_txn")
        Files.createDirectories(markerDir)
        val lines = Seq(
          Seq(tA.name.path(root), sA.epoch.toString, sA.count.toString,
            sA.manifestLines.replace("\n", ";")).mkString("\t"),
          Seq(tB.name.path(root), sB.epoch.toString, sB.count.toString,
            sB.manifestLines.replace("\n", ";")).mkString("\t"),
          Seq(acks.basePath, sAck.epoch.toString, sAck.count.toString,
            sAck.manifestLines.replace("\n", ";")).mkString("\t"))
        val tmp = markerDir.resolve(s"txn-fz$seed.tmp")
        Files.write(tmp, lines.mkString("\n").getBytes)
        Files.move(tmp, markerDir.resolve(s"txn-fz$seed.committed"),
          StandardCopyOption.ATOMIC_MOVE)
      }
      if (phase == 2) rnd.nextInt(3) match {
        case 0 => tA.publishManifest(sA)
        case 1 => tB.publishManifest(sB)
        case 2 => acks.publish(sAck)
      }
      if (phase == 3) { tA.publishManifest(sA); tB.publishManifest(sB); acks.publish(sAck) }

      // sometimes an unrelated producer also died mid-commit markerless
      val extraOrphan = rnd.nextBoolean()
      if (extraOrphan) tA.stageAppend(batch(300 until 304)): Unit

      // janitor from one hour out (≥ any txn timeout)
      val future = System.currentTimeMillis() + 3600 * 1000L
      Txn.vacuumAll(root, Txn.DefaultTimeoutMs, nowMs = () => future): Unit

      val (aRows, bRows, ackRows) =
        (tA.read().count(), tB.read().count(), acks.read().count())
      if (markerWritten) {
        assert(aRows == nA && bRows == 10 + nB && ackRows == nAck,
          s"seed=$seed phase=$phase: committed txn must be FULLY visible, " +
            s"got a=$aRows b=$bRows acks=$ackRows " +
            s"(want $nA/${10 + nB}/$nAck)")
      } else {
        assert(aRows == 0 && bRows == 10 && ackRows == 0,
          s"seed=$seed phase=$phase: uncommitted txn must be INVISIBLE, " +
            s"got a=$aRows b=$bRows acks=$ackRows")
      }
      // hygiene: nothing uncommitted survives; pending set drained
      assert(Txn.slowTransactions(root, 0L, nowMs = () => future).isEmpty,
        s"seed=$seed phase=$phase: staging must be drained")
      assert(acks.pendingAcks().count() == 0, s"seed=$seed: pending drained")
      // idempotence: the second sweep heals and drops nothing
      assert(Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
        nowMs = () => future) == ((0, 0)), s"seed=$seed: second sweep no-op")
      // and the visible counts are stable across it
      assert(tA.read().count() == aRows && tB.read().count() == bRows &&
        acks.read().count() == ackRows, s"seed=$seed: counts stable")
    }
  }
}
