package graft

import graft.log.{AckLog, TopicLog, Txn}
import graft.model.{Envelope, TopicName}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/**
 * Transaction timeout + abandoned-staging vacuum — the reference's
 * coordinator-side timeout abort surfaced client-side
 * (pulsar-transaction/coordinator/.../TransactionTimeoutTracker.java:37
 * fires at the absolute deadline and the store aborts the txn;
 * TransactionBuilder.java:45 withTransactionTimeout;
 * TransactionBuilderImpl.java:38 default 60 s) and storage-side
 * (the transaction buffer discards aborted data; PendingAckHandleImpl
 * releases pending acks so messages redeliver).
 */
class TxnTimeoutSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 5}", s"payload-$i", s"prod-${i % 2}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")
      .withColumn(Envelope.RedeliveryCnt, lit(0))

  test("expired txn self-aborts: commit throws, nothing ever visible") {
    val root = Files.createTempDirectory("graft-txnto").toString
    val out = new TopicLog(spark, root, TopicName.parse("out"), 2)
    var now = 1000L
    val txn = Txn.begin(root, timeoutMs = 100L, clock = () => now)
    txn.produce(out, batch(0 until 10))
    now = 1101L // strictly past deadline (1000 + 100)
    val e = intercept[IllegalArgumentException](txn.commit())
    assert(e.getMessage.contains("TIMED_OUT"))
    assert(txn.status == "TIMED_OUT")
    assert(out.read().count() == 0, "timed-out txn must publish nothing")
    assert(!Files.exists(Paths.get(root, "_txn")) ||
      Files.list(Paths.get(root, "_txn")).count() == 0,
      "no marker may exist for a timed-out txn")
    // recovery replays nothing — there is nothing to replay
    assert(Txn.recover(root) == 0)
  }

  test("produce and ack past the deadline throw; commit AT the deadline succeeds") {
    val root = Files.createTempDirectory("graft-txnto").toString
    val out = new TopicLog(spark, root, TopicName.parse("out"), 2)
    val acks = new AckLog(spark, out.name.path(root), "sub-a")

    var now = 0L
    val expired = Txn.begin(root, timeoutMs = 50L, clock = () => now)
    now = 51L
    intercept[IllegalArgumentException](expired.produce(out, batch(0 until 5)))
    assert(expired.status == "TIMED_OUT")
    intercept[IllegalArgumentException](
      expired.ack(acks, Seq((0, 0L)).toDF("partition", "offset")))

    // deadline is inclusive: clock == openedAt + timeout still commits
    // (expiry is strictly-after, mirroring the tracker firing AFTER the
    // stored absolute timestamp)
    now = 0L
    val edge = Txn.begin(root, timeoutMs = 50L, clock = () => now)
    edge.produce(out, batch(0 until 7))
    now = 50L
    edge.commit()
    assert(edge.status == "COMMITTED")
    assert(out.read().count() == 7)
  }

  test("vacuumStaged drops expired uncommitted epochs; keeps fresh and committed ones") {
    val root = Files.createTempDirectory("graft-txnto").toString
    val log = new TopicLog(spark, root, TopicName.parse("t"), 2)
    val base = log.name.path(root)

    // epoch 0: staged AND manifest committed — a crash between marker
    // and file moves; recovery property, vacuum must not touch it.
    // (Manifest written BEFORE staging the orphan: stageAppend numbers
    // epochs from the committed manifests, so the orphan gets epoch 1.)
    val committed = log.stageAppend(batch(100 until 108))
    Files.createDirectories(Paths.get(base, "_manifest"))
    Files.write(Paths.get(base, "_manifest", s"${committed.epoch}.commit"),
      committed.manifestLines.getBytes)
    // epoch 1: staged, never committed — the mid-commit crash orphan
    val orphan = log.stageAppend(batch(0 until 8))
    assert(orphan.epoch != committed.epoch)

    // a fresh-clock vacuum with a 1h horizon drops nothing
    assert(TopicLog.vacuumStaged(base, olderThanMs = 3600 * 1000L) == 0)
    assert(Files.exists(Paths.get(base, "_staging", orphan.epoch.toString)))

    // from one hour in the future, the orphan is expired garbage; the
    // committed epoch is expired too but healing is recoverStaging's
    // job, never vacuum's
    val future = System.currentTimeMillis() + 3600 * 1000L
    assert(TopicLog.vacuumStaged(base, olderThanMs = 60000L,
      nowMs = () => future) == 1)
    assert(!Files.exists(Paths.get(base, "_staging", orphan.epoch.toString)),
      "expired uncommitted epoch must be gone")
    assert(Files.exists(
      Paths.get(base, "_staging", committed.epoch.toString)),
      "committed epoch must survive vacuum")
    assert(TopicLog.recoverStaging(base) == 1, "…and heal via recovery")
    assert(spark.read.parquet(base).count() == 8, "healed rows readable")
  }

  test("parameterless vacuumStaged auto-detects the _txn root and still protects marker epochs") {
    val root = Files.createTempDirectory("graft-txnauto").toString
    val out = new TopicLog(spark, root, TopicName.parse("out"), 2)
    // same crash window as the explicit-txnRoot test below — but the
    // caller FORGETS txnRoot. The old default made that the unsafe mode
    // (committed data deleted once past the horizon); vacuumStaged must
    // now find the `_txn` directory at the log's ancestor root itself.
    val stagedOut = out.stageAppend(batch(0 until 9))
    val markerDir = Paths.get(root, "_txn")
    Files.createDirectories(markerDir)
    val line = Seq(out.name.path(root), stagedOut.epoch.toString,
      stagedOut.count.toString,
      stagedOut.manifestLines.replace("\n", ";")).mkString("\t")
    val tmp = markerDir.resolve("txn-auto.tmp")
    Files.write(tmp, line.getBytes)
    Files.move(tmp, markerDir.resolve("txn-auto.committed"))

    val farFuture = System.currentTimeMillis() + 365L * 24 * 3600 * 1000
    assert(TopicLog.vacuumStaged(out.name.path(root),
      olderThanMs = Txn.DefaultTimeoutMs, nowMs = () => farFuture) == 0,
      "auto-detected marker protection must survive a parameterless call")
    assert(Files.exists(Paths.get(out.name.path(root), "_staging",
      stagedOut.epoch.toString)))
    assert(Txn.recover(root) >= 1)
    assert(out.read().count() == 9)
  }

  test("vacuum never eats a COMMITTED txn awaiting recovery: marker-referenced epochs are protected") {
    val root = Files.createTempDirectory("graft-txnto").toString
    val out = new TopicLog(spark, root, TopicName.parse("out"), 2)

    // crash AFTER the marker, BEFORE publish: the staged epoch has no
    // topic manifest yet, but the _txn marker makes it COMMITTED data —
    // exactly the state Txn.recover exists to heal. An age-based vacuum
    // that checked only the topic manifest would delete it (data loss of
    // a committed transaction); the marker check must protect it at ANY
    // age.
    val stagedOut = out.stageAppend(batch(0 until 9))
    val markerDir = Paths.get(root, "_txn")
    Files.createDirectories(markerDir)
    val line = Seq(out.name.path(root), stagedOut.epoch.toString,
      stagedOut.count.toString,
      stagedOut.manifestLines.replace("\n", ";")).mkString("\t")
    val tmp = markerDir.resolve("txn-vac.tmp")
    Files.write(tmp, line.getBytes)
    Files.move(tmp, markerDir.resolve("txn-vac.committed"))

    val farFuture = System.currentTimeMillis() + 365L * 24 * 3600 * 1000
    assert(TopicLog.vacuumStaged(out.name.path(root),
      olderThanMs = Txn.DefaultTimeoutMs, nowMs = () => farFuture,
      txnRoot = Some(root)) == 0,
      "marker-referenced epoch must survive vacuum at any age")
    assert(Files.exists(Paths.get(out.name.path(root), "_staging",
      stagedOut.epoch.toString)))
    assert(Txn.recover(root) >= 1, "…and recovery completes the commit")
    assert(out.read().count() == 9, "committed rows intact after vacuum + recover")
  }

  test("commit re-checks the deadline at the marker: staging that outlives it aborts cleanly") {
    val root = Files.createTempDirectory("graft-txnto").toString
    val out = new TopicLog(spark, root, TopicName.parse("out"), 2)
    // clock advances past the deadline BETWEEN commit() entry and the
    // marker write (entry check passes; staging "takes too long"):
    // tick 0 = entry checkOpen, later reads land past the deadline
    // calls: 1 = begin (deadline), 2 = produce checkOpen, 3 = commit
    // ENTRY checkOpen (must pass), 4+ = the marker-point re-check (fires)
    var calls = 0
    val clock = () => { calls += 1; if (calls <= 3) 0L else 999999L }
    val txn = Txn.begin(root, timeoutMs = 100L, clock = clock)
    txn.produce(out, batch(0 until 6))
    val e = intercept[IllegalArgumentException](txn.commit())
    assert(e.getMessage.contains("TIMED_OUT"))
    assert(out.read().count() == 0, "nothing visible")
    assert(!Files.exists(Paths.get(root, "_txn")) ||
      Files.list(Paths.get(root, "_txn")).count() == 0, "no marker written")
    // the at-deadline cleanup dropped the staged epoch eagerly — no
    // orphan for vacuum to collect
    val staging = Paths.get(out.name.path(root), "_staging")
    assert(!Files.exists(staging) || {
      val l = Files.list(staging)
      try l.count() == 0 finally l.close()
    }, "staged epochs dropped at the failed commit point")
  }

  test("vacuumAll: heals markers first, then sweeps topic AND ack staging across the root") {
    val root = Files.createTempDirectory("graft-txnto").toString
    val t1 = new TopicLog(spark, root, TopicName.parse("t1"), 2)
    val t2 = new TopicLog(spark, root, TopicName.parse("t2"), 2)
    t2.append(batch(0 until 10)): Unit
    val acks = new AckLog(spark, t2.name.path(root), "sub-a")

    // t1: crash-after-marker orphan (committed — must HEAL, not drop)
    val committed = t1.stageAppend(batch(100 until 108))
    val markerDir = Paths.get(root, "_txn")
    Files.createDirectories(markerDir)
    Files.write(markerDir.resolve("txn-va.tmp"),
      Seq(t1.name.path(root), committed.epoch.toString, committed.count.toString,
        committed.manifestLines.replace("\n", ";")).mkString("\t").getBytes)
    Files.move(markerDir.resolve("txn-va.tmp"),
      markerDir.resolve("txn-va.committed"))
    // t2: marker-less staged orphan + a dead txn's pending acks
    t2.stageAppend(batch(200 until 205)): Unit
    acks.stageAck(t2.read().select(col(Envelope.Partition).as("partition"),
      col(Envelope.Offset).as("offset"))): Unit
    assert(acks.pendingAcks().count() == 10)

    val future = System.currentTimeMillis() + 2 * Txn.DefaultTimeoutMs
    val (healed, dropped) = Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future)
    assert(healed == 1, "exactly one (topic, epoch) healed — not the " +
      "manifest-write + staged-move double count")
    assert(dropped == 2, s"t2's staged orphan + the ack orphan drop, got $dropped")
    assert(t1.read().count() == 8, "committed txn data intact")
    assert(t2.read().count() == 10, "baseline rows untouched")
    assert(acks.pendingAcks().count() == 0, "dead txn's pending acks released")
    // the fully-published marker retires with the sweep — the janitor's
    // marker parse cannot grow with all-time committed txn count
    assert(!Files.exists(markerDir.resolve("txn-va.committed")),
      "fully-published marker must retire")
    // and a SECOND sweep is a clean no-op
    assert(Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future) == ((0, 0)))
  }

  test("slowTransactions lists in-flight staging with marker classification") {
    val root = Files.createTempDirectory("graft-txnto").toString
    val t1 = new TopicLog(spark, root, TopicName.parse("t1"), 2)
    val t2 = new TopicLog(spark, root, TopicName.parse("t2"), 2)
    t2.append(batch(0 until 6)): Unit
    val acks = new AckLog(spark, t2.name.path(root), "sub-a")

    // committed-awaiting-recovery (marker) vs abandoned (no marker),
    // plus an abandoned ack staging — three in-flight entries
    val committed = t1.stageAppend(batch(100 until 104))
    val markerDir = Paths.get(root, "_txn")
    Files.createDirectories(markerDir)
    Files.write(markerDir.resolve("txn-sl.tmp"),
      Seq(t1.name.path(root), committed.epoch.toString, committed.count.toString,
        committed.manifestLines.replace("\n", ";")).mkString("\t").getBytes)
    Files.move(markerDir.resolve("txn-sl.tmp"),
      markerDir.resolve("txn-sl.committed"))
    t2.stageAppend(batch(200 until 203)): Unit
    acks.stageAck(t2.read().limit(3)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))): Unit

    // young staging is NOT slow
    assert(Txn.slowTransactions(root, olderThanMs = 3600 * 1000L).isEmpty)
    val future = System.currentTimeMillis() + 3600 * 1000L
    val slow = Txn.slowTransactions(root, olderThanMs = 60000L,
      nowMs = () => future)
    assert(slow.size == 3, s"three in-flight stagings, got $slow")
    val byBase = slow.groupBy(_.basePath).view.mapValues(_.head).toMap
    assert(byBase(t1.name.path(root)).markerCommitted,
      "t1's epoch is committed-awaiting-recovery")
    assert(!byBase(t2.name.path(root)).markerCommitted,
      "t2's epoch is abandoned")
    assert(!byBase(acks.basePath).markerCommitted, "ack staging abandoned")
    assert(slow.forall(_.ageMs > 60000L))
    // after the janitor acts, the listing drains
    Txn.vacuumAll(root, Txn.DefaultTimeoutMs, nowMs = () => future): Unit
    assert(Txn.slowTransactions(root, 0L, nowMs = () => future).isEmpty)
  }

  test("timed-out txn's pending acks vacuum away: redelivery unblocks") {
    val root = Files.createTempDirectory("graft-txnto").toString
    val in = new TopicLog(spark, root, TopicName.parse("in"), 2)
    in.append(batch(0 until 12)): Unit
    val acks = new AckLog(spark, in.name.path(root), "sub-a")

    // simulate the crash inside commit(): acks staged, marker never
    // written. The pending set blocks redelivery of those offsets —
    // and with no timeout vacuum it would block FOREVER.
    val toAck = in.read().select(col(Envelope.Partition).as("partition"),
      col(Envelope.Offset).as("offset"))
    acks.stageAck(toAck): Unit
    assert(acks.pendingAcks().count() == 12, "pending set visible pre-vacuum")
    assert(acks.read().count() == 0, "nothing committed")

    val future = System.currentTimeMillis() + 2 * Txn.DefaultTimeoutMs
    assert(TopicLog.vacuumStaged(acks.basePath,
      olderThanMs = Txn.DefaultTimeoutMs, nowMs = () => future) == 1)
    assert(acks.pendingAcks().count() == 0,
      "pending acks of the dead txn released — messages redeliver")
    assert(acks.read().count() == 0, "still nothing committed")
  }

  test("parameterless ACK-LEG vacuum auto-detects _txn six levels up and protects the committed leg") {
    // the ack-log staging base sits at <root>/<tenant>/<ns>/<topic>/
    // _subs/<sub>/acks — six levels below the _txn root; a bounded
    // ancestor probe reaches a topic base but NOT this one, silently
    // reopening the committed-txn data-loss window on the ack leg only
    val root = Files.createTempDirectory("graft-txnackauto").toString
    val in = new TopicLog(spark, root, TopicName.parse("in-ack-auto"), 2)
    in.append(batch(0 until 6)): Unit
    val acks = new AckLog(spark, in.name.path(root), "sub-a")
    val toAck = in.read().select(col(Envelope.Partition).as("partition"),
      col(Envelope.Offset).as("offset"))
    val staged = acks.stageAck(toAck)
    // crash AFTER the marker, BEFORE publish — committed, awaiting recovery
    val markerDir = Paths.get(root, "_txn")
    Files.createDirectories(markerDir)
    val line = Seq(acks.basePath, staged.epoch.toString, staged.count.toString,
      staged.manifestLines.replace("\n", ";")).mkString("\t")
    val tmp = markerDir.resolve("txn-ack-auto.tmp")
    Files.write(tmp, line.getBytes)
    Files.move(tmp, markerDir.resolve("txn-ack-auto.committed"))

    val farFuture = System.currentTimeMillis() + 365L * 24 * 3600 * 1000
    assert(TopicLog.vacuumStaged(acks.basePath,
      olderThanMs = Txn.DefaultTimeoutMs, nowMs = () => farFuture) == 0,
      "marker-protected ack epoch must survive a parameterless ack-leg vacuum")
    assert(Files.exists(Paths.get(acks.basePath, "_staging",
      staged.epoch.toString)))
  }
}
