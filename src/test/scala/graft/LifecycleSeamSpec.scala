package graft

import graft.log.{Admin, PathIO, TopicLog}
import graft.model.{Envelope, TopicName}
import graft.operators.Compaction
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * Crash schedules across the offload ↔ compaction ↔ readCompacted
 * seams — the lifecycle the `lifecycle_composed` oracle row proves at
 * the value level, here proven at the crash level:
 *
 *  - compaction scans the TIERED log: a key whose LAST write was
 *    offloaded to cold storage must still win its compaction slot (a
 *    hot-only scan silently resurrects the stale hot value);
 *  - a half-offloaded file (copy done, unreference not — the offload
 *    crash window) must not double-count in the compaction scan;
 *  - compaction crash between snapshot data and the `_horizon` commit
 *    refuses loudly (never a silent horizonless read) and a re-run
 *    heals by overwrite;
 *  - offload running AFTER compaction (the concurrent-admin schedule)
 *    leaves readCompacted's tail intact — the tail read is tiered too.
 */
class LifecycleSeamSpec extends SparkSpec {
  import spark.implicits._

  private val name = TopicName.parse("persistent://public/default/events")

  private def batch(ids: Range, payload: Int => String = i => s"payload-$i") =
    ids.map(i => (s"u${i % 7}", payload(i), s"prod-${i % 3}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")

  private def mkLog(): TopicLog =
    new TopicLog(spark, Files.createTempDirectory("lc-seam").toString, name, 4)

  test("compaction sees offloaded rows: a key's cold last-write wins over its hot earlier write") {
    val log = mkLog()
    // append 1: every key's EARLY value; append 2: every key's LAST
    // value. Offload append 2's files... offsets: append2 has the higher
    // offsets, so offload by beforeOffset can't take ONLY the second
    // append — instead offload EVERYTHING, leaving the hot tier empty:
    // the only copy of every last-write is cold.
    log.append(batch(0 until 14, i => s"early-$i")): Unit
    log.append(batch(14 until 28, i => s"late-$i")): Unit
    val maxOff = log.read().agg(max(Envelope.Offset)).head().getLong(0)
    assert(Admin.offload(log, beforeOffset = maxOff) > 0)
    log.vacuum(): Unit
    Compaction.triggerCompaction(log)
    val winners = Compaction.readCompactedTopic(log)
      .select(col(Envelope.Key), col(Envelope.Value))
      .as[(String, String)].collect().toMap
    assert(winners.size == 7)
    // every key's winner must be its LATE (cold-only) write
    winners.foreach { case (k, v) =>
      assert(v.startsWith("late-"), s"key $k compacted to stale value $v")
    }
  }

  test("half-offloaded file (copy done, unreference not) never double-counts in compaction") {
    val log = mkLog()
    log.append(batch(0 until 20)): Unit
    // the copy-then-unreference crash window only exists in SNAPSHOT
    // mode (plain logs offload by atomic per-file move) — enter it
    Admin.coalesceFiles(log, filesPerPartition = 1)
    log.vacuum(): Unit // drop the pre-coalesce originals from the walk
    val total = log.read().count()
    // simulate the offload crash window: copy ONE data file to _cold
    // without unreferencing it from the manifest
    val base = PathIO.qualify(log.name.path(log.root))
    val dataFile = PathIO.walkAll(PathIO.path(base.toString))
      .filter(_.getName.endsWith(".parquet")).head
    val rel = PathIO.relativize(base, dataFile)
    val target = PathIO.path(PathIO.child(base, "_cold").toString, rel)
    PathIO.mkdirs(target.getParent)
    PathIO.copy(dataFile, target)
    // the tiered read (compaction's scan) must exclude the cold copy
    assert(Admin.readTiered(log).count() == total,
      "half-offloaded copy double-counted by the tiered scan")
    Compaction.triggerCompaction(log)
    val view = Compaction.readCompactedTopic(log)
    assert(view.groupBy(Envelope.Key).count()
      .filter(col("count") > 1).count() == 0,
      "compaction snapshot carries duplicate keys from the cold copy")
  }

  test("compaction crash before the _horizon commit refuses loudly; re-run heals") {
    val log = mkLog()
    log.append(batch(0 until 20)): Unit
    Compaction.triggerCompaction(log)
    val healthy = Compaction.readCompactedTopic(log).count()
    // crash window: snapshot data present, _horizon lost
    val outDir = log.name.path(log.root) + "/_compacted"
    PathIO.deleteIfExists(PathIO.path(outDir, "_horizon")): Unit
    val e = intercept[IllegalArgumentException] {
      Compaction.readCompactedTopic(log)
    }
    assert(e.getMessage.contains("triggerCompaction"))
    // re-running the verb overwrites both snapshot and horizon
    Compaction.triggerCompaction(log)
    assert(Compaction.readCompactedTopic(log).count() == healthy)
  }

  test("offload AFTER compaction: the uncompacted tail reads through the cold tier") {
    val log = mkLog()
    log.append(batch(0 until 20)): Unit
    Compaction.triggerCompaction(log)
    log.append(batch(20 until 30)): Unit // the tail past the horizon
    def viewSet() = Compaction.readCompactedTopic(log)
      .select(col(Envelope.Key), col(Envelope.Value), col(Envelope.Offset))
      .as[(String, String, Long)].collect().toSet
    val before = viewSet()
    // offload EVERYTHING (tail included), collect the hot originals
    val maxOff = log.read().agg(max(Envelope.Offset)).head().getLong(0)
    assert(Admin.offload(log, beforeOffset = maxOff) > 0)
    log.vacuum(): Unit
    val after = viewSet()
    assert(after == before,
      s"tail changed across offload: ${(before -- after) ++ (after -- before)}")
  }

  test("lifecycle end-to-end on the object-store scheme: offload -> compact -> tail -> stats") {
    MockS3FileSystem.register(spark.sparkContext.hadoopConfiguration)
    val root = "mocks3:" + Files.createTempDirectory("lc-seam-s3").toString
    val log = new TopicLog(spark, root, name, 4)
    log.append(batch(0 until 14, i => s"early-$i")): Unit
    log.append(batch(14 until 28, i => s"late-$i")): Unit
    val maxOff = log.read().agg(max(Envelope.Offset)).head().getLong(0)
    assert(Admin.offload(log, beforeOffset = maxOff) > 0)
    log.vacuum(): Unit
    Compaction.triggerCompaction(log)
    log.append(batch(28 until 38, i => s"tail-$i")): Unit
    val view = Compaction.readCompactedTopic(log)
    // 7 compacted winners + 10 tail rows
    assert(view.count() == 17)
    val winners = view.filter(col(Envelope.Value).startsWith("late-")).count()
    assert(winners == 7, s"cold last-writes lost on mocks3: $winners/7")
  }
}
