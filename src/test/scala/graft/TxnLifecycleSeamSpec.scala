package graft

import graft.log.{Admin, PathIO, TopicLog, Txn}
import graft.model.{Envelope, TopicName}
import graft.operators.Compaction

import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * The lifecycle × transactions seam (verdict r15 #7): transactions are
 * the one lifecycle verb `lifecycle_composed` does not cross. The
 * contracts under test, each a consequence of staged-epoch invisibility
 * (`_staging` is an underscore subtree no admin verb touches) plus the
 * single-writer-per-topic append contract:
 *  - offload and compaction run DURING a txn's staged-but-uncommitted
 *    window see only committed data and never move/compact/delete the
 *    staged files;
 *  - a txn that commits AFTER triggerCompaction lands wholly in the
 *    uncompacted tail: its offsets base on the committed high-water at
 *    stage time, which equals the compaction horizon (no other writer
 *    can advance it), so no committed row can fall between snapshot
 *    and tail;
 *  - the janitor during the txn's open window drops nothing (age
 *    horizon), and after the commit marker it HEALS rather than drops,
 *    even when offload rearranged the committed prefix in between —
 *    the crash schedule, run on `mocks3:` (rename-replacing,
 *    conditional-PUT object-store semantics).
 */
class TxnLifecycleSeamSpec extends SparkSpec {
  MockS3FileSystem.register(SparkSpec.session.sparkContext.hadoopConfiguration)
  import spark.implicits._

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 5}", s"payload-$i", s"prod-${i % 2}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")
      .withColumn(Envelope.RedeliveryCnt, lit(0))

  private def writeMarker(root: String, id: String, t: TopicLog,
                          s: graft.log.TopicLog.StagedAppend): Unit = {
    val line = Seq(t.name.path(root), s.epoch.toString, s.count.toString,
      s.manifestLines.replace("\n", ";")).mkString("\t")
    val dir = PathIO.path(root, "_txn")
    PathIO.mkdirs(dir)
    assert(PathIO.atomicCreate(PathIO.child(dir, s"$id.committed"),
      line.getBytes("UTF-8")))
  }

  test("offload + compaction during a staged txn touch only committed data; the late commit lands in the tail") {
    val root = Files.createTempDirectory("txnlc").toString
    val t = new TopicLog(spark, root, TopicName.parse("lx"), 2)
    t.append(batch(0 until 10)): Unit
    // a txn mid-commit: staged, marker not yet written
    val s = t.stageAppend(batch(100 until 105))
    val stagingDir = PathIO.path(t.name.path(root), "_staging", s.epoch.toString)
    val stagedBefore = PathIO.walkAll(stagingDir)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSet
    assert(stagedBefore.nonEmpty)
    // offload EVERYTHING committed to cold: must not see staged files
    val moved = Admin.offload(t, beforeOffset = Long.MaxValue)
    assert(moved > 0)
    assert(PathIO.walkAll(stagingDir).filter(_.getName.endsWith(".parquet"))
      .map(_.toString).toSet === stagedBefore,
      "offload must never move a staged epoch's files")
    assert(Admin.readTiered(t).count() === 10,
      "staged rows stay invisible across offload (tiered view)")
    assert(t.read().count() === 0,
      "offset-only offload moved every committed file cold")
    // compact the (now tiered) committed prefix
    val horizon = Compaction.triggerCompaction(t)
    assert(horizon.nonEmpty)
    // the janitor during the open window: nothing to heal, nothing aged
    assert(Txn.vacuumAll(root, Txn.DefaultTimeoutMs) === ((0, 0)))
    assert(PathIO.exists(stagingDir), "in-window janitor must not drop the staged epoch")
    // the commit completes (marker + publish — the Txn.commit tail)
    writeMarker(root, "txn-lc1", t, s)
    t.publishManifest(s)
    assert(t.read().count() === 5, "hot tier holds exactly the txn rows")
    assert(Admin.readTiered(t).count() === 15)
    // every txn offset exceeds the horizon: the tail serves them whole
    val tailMin = t.read().filter(col(Envelope.Value).startsWith("payload-10"))
      .groupBy(Envelope.Partition).agg(min(Envelope.Offset).as("o"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    tailMin.foreach { case (p, o) =>
      assert(o > horizon(p), s"txn row at partition $p offset $o is not " +
        s"past the compaction horizon ${horizon(p)}")
    }
    // readCompacted view: per key, the winning (max-offset) value is the
    // txn's write — compacted snapshot + tail compose correctly
    val winners = Compaction.readCompactedTopic(t)
      .groupBy(Envelope.Key)
      .agg(max(struct(col(Envelope.Offset), col(Envelope.Value))).as("w"))
      .select(col(Envelope.Key), col("w.value"))
      .as[(String, String)].collect().toMap
    (100 until 105).foreach { i =>
      assert(winners(s"u${i % 5}") === s"payload-$i",
        s"key u${i % 5} must resolve to the txn's last write")
    }
    // fully published: the retiring janitor has nothing left
    val future = System.currentTimeMillis() + 3600 * 1000L
    assert(Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future) === ((0, 0)))
    assert(Txn.slowTransactions(root, 0L, nowMs = () => future).isEmpty)
  }

  test("mocks3 crash schedule: marker written, publish crashed, offload PROCEEDS (takes the reserved epoch) — the janitor merges the txn forward, then compact tiered") {
    val local = Files.createTempDirectory("txnlc-s3")
    val root = s"${MockS3FileSystem.Scheme}:$local"
    val t = new TopicLog(spark, root, TopicName.parse("ls3"), 2)
    t.append(batch(0 until 10)): Unit // snapshot mode (direct staging)
    val s = t.stageAppend(batch(100 until 105))
    writeMarker(root, "txn-lc2", t, s)
    // CRASH here: committed by marker, manifest unpublished. Round 17:
    // the lifecycle keeps moving WITHOUT refusing — offload commits its
    // lifecycle manifest AT the staged epoch's reserved number; the
    // txn's content merges forward when the janitor replays the marker
    // (the availability the reference gets from broker serialization).
    assert(Admin.offload(t, beforeOffset = Long.MaxValue) > 0)
    assert(Admin.readTiered(t).count() === 10,
      "committed view unharmed; staged rows still invisible")
    assert(PathIO.exists(TopicLog.stagingRecord(t.name.path(root), s.epoch)),
      "offload must not touch the in-flight staging record")
    // janitor from an hour out: the marker PROTECTS the aged staged
    // epoch; recover() finds the reserved epoch occupied by the
    // lifecycle manifest and MERGES the txn forward
    val future = System.currentTimeMillis() + 3600 * 1000L
    val (healed, dropped) = Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future)
    assert(healed >= 1 && dropped === 0,
      s"janitor must merge-heal, not drop (healed=$healed dropped=$dropped)")
    assert(Admin.readTiered(t).count() === 15, "merged txn rows visible")
    assert(PathIO.exists(TopicLog.mergedMarker(t.name.path(root), s.epoch)),
      "the merge must be durably recorded")
    assert(!PathIO.exists(TopicLog.stagingRecord(t.name.path(root), s.epoch)),
      "the staging record clears once the merge is durable")
    // no offset ever served twice across the merge
    assert(Admin.readTiered(t)
      .select(Envelope.Partition, Envelope.Offset).distinct().count() === 15)
    // with the txn merged the next offload picks up its rows
    assert(Admin.offload(t, beforeOffset = Long.MaxValue) > 0)
    assert(Admin.readTiered(t).count() === 15,
      "offloaded prefix + merged txn rows all served tiered")
    // compaction over the merged, tiered log: every key's winner is the
    // txn's write; the tiered read serves hot tail + cold prefix
    Compaction.triggerCompaction(t): Unit
    val winners = Compaction.readCompactedTopic(t)
      .groupBy(Envelope.Key)
      .agg(max(struct(col(Envelope.Offset), col(Envelope.Value))).as("w"))
      .select(col(Envelope.Key), col("w.value"))
      .as[(String, String)].collect().toMap
    (100 until 105).foreach { i =>
      assert(winners(s"u${i % 5}") === s"payload-$i")
    }
    assert(Admin.readTiered(t)
      .select(Envelope.Partition, Envelope.Offset).distinct().count()
      === Admin.readTiered(t).count(), "tiered read must not double-count")
    // converged: second sweep heals and drops nothing, and the marker
    // retires only because the merged epoch RESOLVES it
    assert(Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future) === ((0, 0)))
    assert(!PathIO.exists(PathIO.path(root, "_txn", "txn-lc2.committed")),
      "fully-merged marker retires")
  }

  test("merge-forward on local fs: coalesce AND retention land during a staged txn; the late commit re-bases with no refusal and no loss") {
    val root = Files.createTempDirectory("txnlc-mf").toString
    val t = new TopicLog(spark, root, TopicName.parse("lmf"), 2)
    t.append(batch(0 until 10)): Unit
    Admin.coalesceFiles(t, filesPerPartition = 1) // enter snapshot mode
    t.vacuum(): Unit
    val hwBefore = t.highWater()
    // txn stages (move-based tree at the reserved epoch) and stalls
    val s = t.stageAppend(batch(100 until 105))
    // TWO lifecycle verbs advance the chain past the reservation
    Admin.coalesceFiles(t, filesPerPartition = 1)
    assert(Admin.offload(t, beforeOffset = Long.MaxValue) > 0) // drops + moves cold
    assert(t.highWater() === hwBefore,
      "lifecycle manifests must preserve the high-water")
    assert(t.read().count() === 0, "offloaded prefix left the hot tier")
    // the stalled txn commits late: marker + publish — publish finds its
    // epoch taken by lifecycle manifests and merges forward
    writeMarker(root, "txn-mf1", t, s)
    t.publishManifest(s)
    assert(Admin.readTiered(t).count() === 15, "no row lost across the merge")
    assert(Admin.readTiered(t)
      .select(Envelope.Partition, Envelope.Offset).distinct().count() === 15,
      "no offset served twice after the merge")
    // txn rows are all past the (preserved) high-water of stage time
    val txnMin = t.read().filter(col(Envelope.Value).startsWith("payload-10"))
      .groupBy(Envelope.Partition).agg(min(Envelope.Offset).as("o"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    txnMin.foreach { case (p, o) =>
      assert(o > hwBefore(p), s"txn offset $o at partition $p must be past " +
        s"the pre-merge high-water ${hwBefore(p)}")
    }
    assert(PathIO.exists(TopicLog.mergedMarker(t.name.path(root), s.epoch)))
    assert(!PathIO.exists(PathIO.path(t.name.path(root), "_staging",
      s.epoch.toString)), "staged tree moves complete after the merge")
    // replay (Txn.recover) after the merged-forward chain: converges to
    // a no-op — no new epochs, same rows
    val epochsAfter = PathIO.listDir(
      PathIO.path(t.name.path(root), "_manifest"))
      .map(_.getName).filter(_.endsWith(".commit")).sorted
    assert(Txn.recover(root) === 0)
    assert(PathIO.listDir(PathIO.path(t.name.path(root), "_manifest"))
      .map(_.getName).filter(_.endsWith(".commit")).sorted === epochsAfter)
    assert(Admin.readTiered(t).count() === 15)
    // marker retires once resolved
    val future = System.currentTimeMillis() + 3600 * 1000L
    Txn.vacuumAll(root, Txn.DefaultTimeoutMs, nowMs = () => future): Unit
    assert(!PathIO.exists(PathIO.path(root, "_txn", "txn-mf1.committed")))
  }

  test("merge crash window on mocks3: merged manifest committed but durable marker lost — replay converges without re-merging") {
    val local = Files.createTempDirectory("txnlc-s3b")
    val root = s"${MockS3FileSystem.Scheme}:$local"
    val t = new TopicLog(spark, root, TopicName.parse("ls3b"), 2)
    t.append(batch(0 until 10)): Unit
    val s = t.stageAppend(batch(100 until 105))
    writeMarker(root, "txn-lc3", t, s)
    val base = t.name.path(root)
    val record = PathIO.readString(TopicLog.stagingRecord(base, s.epoch))
    // lifecycle takes the reserved epoch, then the merge completes
    Admin.coalesceFiles(t, filesPerPartition = 1)
    t.publishManifest(s)
    assert(Admin.readTiered(t).count() === 15)
    val epochsDone = TopicLog.committedEpochsAt(base)
    // CRASH RECONSTRUCTION: the merged manifest (with its M-provenance)
    // is durable, but the merged marker and record cleanup are lost —
    // the window between the merged commit and finishVia's bookkeeping
    assert(PathIO.deleteIfExists(TopicLog.mergedMarker(base, s.epoch)))
    assert(PathIO.atomicCreate(TopicLog.stagingRecord(base, s.epoch),
      record.getBytes("UTF-8")))
    // replay: the provenance scan finds the merged epoch, re-creates the
    // marker, clears the record — and commits NOTHING new
    assert(Txn.recover(root) >= 1)
    assert(TopicLog.committedEpochsAt(base) === epochsDone,
      "replay after the crash window must not grow the chain")
    assert(PathIO.exists(TopicLog.mergedMarker(base, s.epoch)))
    assert(!PathIO.exists(TopicLog.stagingRecord(base, s.epoch)))
    assert(Admin.readTiered(t).count() === 15)
    assert(Admin.readTiered(t)
      .select(Envelope.Partition, Envelope.Offset).distinct().count() === 15)
  }

  test("janitor past the timeout drops an ABANDONED (markerless) staged epoch but only that") {
    val root = Files.createTempDirectory("txnlc-ab").toString
    val t = new TopicLog(spark, root, TopicName.parse("lab"), 2)
    t.append(batch(0 until 10)): Unit
    t.stageAppend(batch(100 until 105)): Unit // producer dies markerless
    Admin.offload(t, beforeOffset = Long.MaxValue): Unit
    val future = System.currentTimeMillis() + 3600 * 1000L
    val (healed, dropped) = Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future)
    assert(healed === 0 && dropped === 1)
    assert(Admin.readTiered(t).count() === 10,
      "committed data untouched by the drop")
  }
}
