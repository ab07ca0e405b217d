package graft

import graft.log.{Admin, PathIO, TopicLog, Txn}
import graft.model.{Envelope, TopicName}

import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * Direct staged appends on object-store topics ([[TopicLog]] class doc
 * of `stagingRecord`): data files land AT THEIR FINAL PATHS through the
 * rename-free committer, the `_staging/<epoch>.files` record carries
 * the staged-epoch protocol state, and publish commits by manifest
 * alone — the per-file publish moves (a server-side COPY of the whole
 * batch on real object stores) do not exist. Every test runs on
 * `mocks3:` with [[MockS3FileSystem.Ops]] request counting.
 */
class TopicLogDirectStageSpec extends SparkSpec {
  MockS3FileSystem.register(SparkSpec.session.sparkContext.hadoopConfiguration)
  import spark.implicits._
  private val Ops = MockS3FileSystem.Ops

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 5}", s"payload-$i", s"prod-${i % 2}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")
      .withColumn(Envelope.RedeliveryCnt, lit(0))

  private def mkRoot(): String =
    s"${MockS3FileSystem.Scheme}:" + Files.createTempDirectory("tl-direct")

  test("appends on mocks3: ZERO copy, ZERO rename, snapshot mode from the first manifest") {
    val root = mkRoot()
    val t = new TopicLog(spark, root, TopicName.parse("d1"), 2)
    Ops.reset()
    t.append(batch(0 until 10)): Unit
    val d1 = Ops.snapshot()
    assert(d1("copy") == 0L && d1("rename") == 0L,
      s"append must not copy/rename: ${Ops.render(d1)}")
    assert(t.manifestFiles().exists(_.nonEmpty),
      "direct staging must bootstrap snapshot mode")
    assert(t.read().count() === 10)
    // second append carries the snapshot forward
    Ops.reset()
    t.append(batch(10 until 16)): Unit
    val d2 = Ops.snapshot()
    assert(d2("copy") == 0L && d2("rename") == 0L, Ops.render(d2))
    assert(t.read().count() === 16)
    assert(t.read().select(Envelope.Value).as[String].collect().toSet ===
      (0 until 16).map(i => s"payload-$i").toSet)
    // no staging records linger after publish
    val staging = PathIO.path(t.name.path(root), "_staging")
    assert(!PathIO.exists(staging) ||
      PathIO.listDir(staging).forall(!_.getName.endsWith(".files")))
  }

  test("staged-but-unpublished epoch: invisible, janitor-protected in window, dropped past the horizon") {
    val root = mkRoot()
    val t = new TopicLog(spark, root, TopicName.parse("d2"), 2)
    t.append(batch(0 until 10)): Unit
    val s = t.stageAppend(batch(100 until 105))
    val base = t.name.path(root)
    assert(PathIO.exists(TopicLog.stagingRecord(base, s.epoch)),
      "direct staging must leave its record")
    assert(t.read().count() === 10, "staged rows invisible pre-publish")
    // in-window janitor: age below the horizon → untouched
    assert(Txn.vacuumAll(root, Txn.DefaultTimeoutMs) === ((0, 0)))
    assert(PathIO.exists(TopicLog.stagingRecord(base, s.epoch)))
    // surfaced as a slow transaction once aged (markerless → abandoned)
    val future = System.currentTimeMillis() + 3600 * 1000L
    val slow = Txn.slowTransactions(root, Txn.DefaultTimeoutMs,
      nowMs = () => future)
    assert(slow.map(x => (x.epoch, x.markerCommitted)) === Seq((s.epoch, false)))
    // past the horizon the janitor drops record AND final-path files
    val staged = TopicLog.readStagingRecord(base, s.epoch)
    assert(staged.nonEmpty)
    val (healed, dropped) = Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future)
    assert(healed === 0 && dropped === 1)
    assert(!PathIO.exists(TopicLog.stagingRecord(base, s.epoch)))
    staged.foreach(rel => assert(!PathIO.exists(PathIO.path(base, rel)),
      s"abandoned staged file must be deleted: $rel"))
    assert(t.read().count() === 10, "committed data untouched")
  }

  test("txn marker protects an aged direct staging; recover publishes and the record clears") {
    val root = mkRoot()
    val t = new TopicLog(spark, root, TopicName.parse("d3"), 2)
    t.append(batch(0 until 10)): Unit
    val s = t.stageAppend(batch(100 until 105))
    val base = t.name.path(root)
    // the txn's commit marker lands; publish crashes
    val line = Seq(base, s.epoch.toString, s.count.toString,
      s.manifestLines.replace("\n", ";")).mkString("\t")
    val markerDir = PathIO.path(root, "_txn")
    PathIO.mkdirs(markerDir)
    assert(PathIO.atomicCreate(PathIO.child(markerDir, "txn-d3.committed"),
      line.getBytes("UTF-8")))
    val future = System.currentTimeMillis() + 3600 * 1000L
    Ops.reset()
    val (healed, dropped) = Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future)
    val d = Ops.snapshot()
    assert(healed >= 1 && dropped === 0,
      s"marker must protect and recover must heal: $healed/$dropped")
    assert(d("copy") == 0L && d("rename") == 0L,
      s"the heal is manifest-only — no moves: ${Ops.render(d)}")
    assert(t.read().count() === 15)
    assert(!PathIO.exists(TopicLog.stagingRecord(base, s.epoch)),
      "healed record must be cleaned")
    // idempotent second sweep
    assert(Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future) === ((0, 0)))
  }

  test("publish crash AFTER manifest, before record cleanup: heal removes only the record") {
    val root = mkRoot()
    val t = new TopicLog(spark, root, TopicName.parse("d4"), 2)
    t.append(batch(0 until 6)): Unit
    val s = t.stageAppend(batch(100 until 103))
    val base = t.name.path(root)
    // manifest commit without the record cleanup (the crash point)
    PathIO.mkdirs(PathIO.path(base, "_manifest"))
    assert(TopicLog.atomicCreate(
      PathIO.path(base, "_manifest", s"${s.epoch}.commit"),
      s.manifestLines.getBytes("UTF-8")))
    assert(t.read().count() === 9, "manifest committed = rows visible")
    assert(PathIO.exists(TopicLog.stagingRecord(base, s.epoch)))
    // either janitor heals the leftover record, deleting NO data
    val future = System.currentTimeMillis() + 3600 * 1000L
    assert(Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future)._2 === 0, "a committed epoch is never dropped")
    assert(!PathIO.exists(TopicLog.stagingRecord(base, s.epoch)))
    assert(t.read().count() === 9)
  }

  test("same-epoch retry purges the crashed attempt's final-path files") {
    val root = mkRoot()
    val t = new TopicLog(spark, root, TopicName.parse("d5"), 2)
    t.append(batch(0 until 6)): Unit
    val base = t.name.path(root)
    val s1 = t.stageAppend(batch(100 until 105)) // crashed producer: never published
    val ghost = TopicLog.readStagingRecord(base, s1.epoch)
    assert(ghost.nonEmpty)
    // retry stages the SAME epoch (committedEpochs unchanged) and wins
    val s2 = t.stageAppend(batch(200 until 204))
    assert(s2.epoch === s1.epoch)
    ghost.foreach(rel => assert(!PathIO.exists(PathIO.path(base, rel)),
      s"crashed attempt's file must be purged by the retry: $rel"))
    t.publishManifest(s2)
    assert(t.read().count() === 10)
    assert(t.read().select(Envelope.Value).as[String].collect().toSet ===
      ((0 until 6) ++ (200 until 204)).map(i => s"payload-$i").toSet)
  }

  test("coalesce (replaceDataFiles) on mocks3 rewrites without copy/rename; vacuum collects the replaced files") {
    val root = mkRoot()
    val t = new TopicLog(spark, root, TopicName.parse("d6"), 2)
    t.append(batch(0 until 10)): Unit
    t.append(batch(10 until 20)): Unit
    val before = t.read().select(Envelope.Partition, Envelope.Offset,
      Envelope.Value).as[(Int, Long, String)].collect().toSet
    Ops.reset()
    Admin.coalesceFiles(t, filesPerPartition = 1)
    val d = Ops.snapshot()
    assert(d("copy") == 0L && d("rename") == 0L,
      s"coalesce rewrite must not copy/rename: ${Ops.render(d)}")
    assert(t.read().select(Envelope.Partition, Envelope.Offset,
      Envelope.Value).as[(Int, Long, String)].collect().toSet === before)
    val freed = t.vacuum()
    assert(freed > 0, "replaced originals await vacuum")
    assert(t.read().select(Envelope.Partition, Envelope.Offset,
      Envelope.Value).as[(Int, Long, String)].collect().toSet === before)
  }

  test("record-less crash (driver death before the staging record): orphans stay outside the snapshot; the retry never doubles rows") {
    val root = mkRoot()
    val t = new TopicLog(spark, root, TopicName.parse("d8"), 2)
    t.append(batch(0 until 10)): Unit
    val base = t.name.path(root)
    // simulate the ADVICE-r16 window: the direct write completed (files
    // at final paths) but the process died before the `_staging` record
    // existed — stage, then erase the record
    val s = t.stageAppend(batch(100 until 105))
    val orphans = TopicLog.readStagingRecord(base, s.epoch)
    assert(orphans.nonEmpty)
    assert(PathIO.deleteIfExists(TopicLog.stagingRecord(base, s.epoch)))
    // the orphans are invisible: a direct topic is ALWAYS in snapshot
    // mode (bootstrapped before the first write), and nothing ever
    // references them
    assert(t.read().count() === 10)
    // the retry lands the same rows at the SAME offsets — served once
    t.append(batch(100 until 105)): Unit
    assert(t.read().count() === 15)
    assert(t.read().select(Envelope.Partition, Envelope.Offset)
      .distinct().count() === 15, "no offset served twice")
    assert(orphans.forall(f => !t.manifestFiles().get.contains(f)),
      "orphan files must never enter the snapshot")
    // vacuum collects them
    assert(t.vacuum() >= orphans.size)
    orphans.foreach(f => assert(!PathIO.exists(PathIO.path(base, f))))
    assert(t.read().count() === 15)
  }

  test("offset-only legacy history: the snapshot bootstrap's footer guard deletes record-less orphans past the high-water") {
    val root = mkRoot()
    val t = new TopicLog(spark, root, TopicName.parse("d9"), 2)
    // build OFFSET-ONLY history the pre-direct way (escape hatch)
    spark.conf.set("spark.graft.directStage", "false")
    try t.append(batch(0 until 10)): Unit
    finally spark.conf.unset("spark.graft.directStage")
    assert(t.manifestFiles().isEmpty, "fixture must be offset-only")
    val base = t.name.path(root)
    val hw = t.highWater()
    // a LEGACY crashed direct attempt's orphan: complete parquet at a
    // final path, offsets past the committed high-water, no record
    val tmpOut = s"${MockS3FileSystem.Scheme}:" +
      Files.createTempDirectory("tl-orphan")
    Seq(("uX", "orphan-a", "p", 0L, hw(0) + 1L),
        ("uX", "orphan-b", "p", 1L, hw(0) + 2L))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, Envelope.Offset)
      .withColumn(Envelope.PublishTime, timestamp_seconds(lit(1)))
      .withColumn(Envelope.RedeliveryCnt, lit(0))
      .withColumn(Envelope.Topic, lit(t.name.fqn))
      .coalesce(1).write.mode("overwrite").parquet(tmpOut)
    val part = PathIO.walkAll(PathIO.path(tmpOut))
      .find(_.getName.endsWith(".parquet")).get
    val orphan = PathIO.path(base, "partition=0", "part-legacy-orphan.parquet")
    PathIO.copy(part, orphan)
    assert(PathIO.exists(orphan))
    // first DIRECT append: the bootstrap walks the offset-only history —
    // the footer guard must exclude AND delete the orphan, not adopt it
    t.append(batch(10 until 16)): Unit
    assert(!PathIO.exists(orphan),
      "bootstrap must purge the past-high-water orphan")
    assert(t.read().count() === 16)
    assert(!t.read().select(Envelope.Value).as[String].collect()
      .exists(_.startsWith("orphan-")), "orphan rows must never surface")
    assert(t.read().select(Envelope.Partition, Envelope.Offset)
      .distinct().count() === 16)
  }

  test("escape hatch: spark.graft.directStage=false restores the move-based staging") {
    val root = mkRoot()
    spark.conf.set("spark.graft.directStage", "false")
    try {
      val t = new TopicLog(spark, root, TopicName.parse("d7"), 2)
      Ops.reset()
      t.append(batch(0 until 8)): Unit
      val d = Ops.snapshot()
      assert(d("copy") > 0L, "legacy staging publishes by per-file move " +
        s"(copy on mocks3): ${Ops.render(d)}")
      assert(t.read().count() === 8)
    } finally spark.conf.unset("spark.graft.directStage")
  }
}
