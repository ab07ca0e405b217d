package graft

import graft.log.{Admin, TopicLog}
import graft.model.{Envelope, TopicName}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.collection.JavaConverters._

/**
 * Crash-safety and snapshot-isolation contract of the coalesce/rewrite
 * path (Admin.coalesceFiles → TopicLog.replaceDataFiles): the rewrite
 * becomes visible at ONE atomic manifest commit; a crash on either side
 * of that commit never loses a committed row; replaced files survive
 * until vacuum so concurrent readers keep working.
 */
class CoalesceSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def freshLog(parts: Int = 4): TopicLog = {
    val root = Files.createTempDirectory("graft-coalesce").toString
    new TopicLog(spark, root, TopicName.parse("t"), numPartitions = parts)
  }

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 7}", s"payload-$i", s"prod-${i % 3}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")

  private def contents(log: TopicLog): Set[(Int, Long, String)] =
    log.read().select(col(Envelope.Partition), col(Envelope.Offset),
      col(Envelope.Value)).as[(Int, Long, String)].collect().toSet

  private def physicalParquet(log: TopicLog): Seq[String] = {
    val base = Paths.get(log.name.path(log.root))
    Files.walk(base).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !base.relativize(p).iterator().asScala.exists(
          _.getFileName.toString.startsWith("_")))
      .map(p => base.relativize(p).toString).toSeq
  }

  test("coalesce preserves rows, snapshots the file list, defers deletion to vacuum") {
    val log = freshLog()
    log.append(batch(0 until 50))
    log.append(batch(50 until 100))
    log.append(batch(100 until 150))
    val before = contents(log)
    val filesBefore = physicalParquet(log).size
    assert(filesBefore > 4, "need several small files to coalesce")

    Admin.coalesceFiles(log, filesPerPartition = 1)
    assert(contents(log) == before, "rows unchanged across coalesce")
    val snapshot = log.manifestFiles().getOrElse(fail("file snapshot missing"))
    assert(snapshot.size == 4, "one file per partition")
    // old files still on disk (deferred delete), but unreferenced
    assert(physicalParquet(log).size == filesBefore + 4)

    val deleted = log.vacuum()
    assert(deleted == filesBefore)
    assert(contents(log) == before, "rows unchanged across vacuum")
    assert(physicalParquet(log).toSet == snapshot.toSet)
  }

  test("crash BEFORE manifest commit: staged rewrite stays invisible, old snapshot intact") {
    val log = freshLog()
    log.append(batch(0 until 80))
    val before = contents(log)
    // simulate the rewrite dying after its staging write, before commit
    log.read().repartition(1, col(Envelope.Partition))
      .write.mode("append").partitionBy(Envelope.Partition)
      .parquet(log.name.path(log.root) + "/_staging/999")
    assert(contents(log) == before, "uncommitted staging never visible")
    // recovery must NOT promote a manifest-less epoch
    assert(TopicLog.recoverStaging(log.name.path(log.root)) == 0)
    assert(contents(log) == before)
  }

  test("crash BETWEEN manifest commit and staged moves: recovery completes the swap") {
    val log = freshLog()
    log.append(batch(0 until 80))
    val before = contents(log)
    val base = log.name.path(log.root)

    // stage the coalesced files exactly as replaceDataFiles would
    val epoch = 1L
    log.read().repartition(1, col(Envelope.Partition))
      .write.mode("append").partitionBy(Envelope.Partition)
      .parquet(s"$base/_staging/$epoch")
    val stagingDir = Paths.get(base, "_staging", epoch.toString)
    val staged = Files.walk(stagingDir).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => stagingDir.relativize(p).toString).toSeq.sorted
    val hwLines = (0 until 4).map(p => s"$p,${log.highWater().getOrElse(p, -1L)}")
    // "crash": the manifest commit lands, the file moves never run
    Files.write(Paths.get(base, "_manifest", s"$epoch.commit"),
      (hwLines ++ staged.map("F," + _)).mkString("\n").getBytes)

    assert(TopicLog.recoverStaging(base) == 1, "recovery heals the committed epoch")
    assert(contents(log) == before, "no committed row lost across the crash window")
    assert(log.manifestFiles().get.toSet == staged.toSet)
  }

  test("coalesce RETRY after a staging-only crash does not duplicate rows") {
    val log = freshLog()
    log.append(batch(0 until 70))
    val before = contents(log)
    // crashed first attempt: staged files exist at the NEXT epoch (1),
    // no manifest — indistinguishable from a LIVE transaction's staging
    // at that epoch. Round 17: the retry no longer refuses OR purges —
    // the rewrite stages under its own `rw-` name and commits a
    // lifecycle manifest at the contended epoch; were the staging a
    // live txn's, its publish would merge forward past it.
    log.read().repartition(1, col(Envelope.Partition))
      .write.mode("append").partitionBy(Envelope.Partition)
      .parquet(log.name.path(log.root) + "/_staging/1")
    // escape hatch first: with merge-forward off, the round-16 refusal
    // is retained verbatim
    spark.conf.set("spark.graft.lifecycleMerge", "false")
    val refusal =
      try intercept[IllegalArgumentException] {
        Admin.coalesceFiles(log, filesPerPartition = 1)
      } finally spark.conf.unset("spark.graft.lifecycleMerge")
    assert(refusal.getMessage.contains("in-flight staged"))
    assert(contents(log) == before, "refusal must leave the log untouched")
    // merge-forward path: the retry proceeds WITHOUT waiting for the
    // janitor, and the abandoned staging stays untouched (it might be a
    // live transaction's)
    Admin.coalesceFiles(log, filesPerPartition = 1)
    assert(contents(log) == before, "stale staged files must not double rows")
    assert(log.manifestFiles().get.size == 4)
    assert(graft.log.PathIO.exists(graft.log.PathIO.path(
      log.name.path(log.root), "_staging", "1")),
      "the rewrite must not purge a staging it cannot prove abandoned")
    // the janitor collects the abandoned (markerless, aged) staging
    assert(graft.log.TopicLog.vacuumStaged(
      log.name.path(log.root), olderThanMs = 0L) === 1)
    log.vacuum()
    assert(contents(log) == before)
  }

  test("appends after coalesce carry the file snapshot forward — no duplicate reads") {
    val log = freshLog()
    log.append(batch(0 until 60))
    Admin.coalesceFiles(log, filesPerPartition = 1)
    // old files still on disk; a snapshot-unaware reader would double-count
    log.append(batch(60 until 90))
    val rows = log.read().count()
    assert(rows == 90, s"expected 90 rows, got $rows")
    assert(log.manifestFiles().get.size > 4, "snapshot grew with the append")
    // vacuum keeps exactly the snapshot
    log.vacuum()
    assert(log.read().count() == 90)
  }

  test("retention and offload stay manifest-consistent after coalesce") {
    val log = freshLog()
    log.append(batch(0 until 100))
    Admin.coalesceFiles(log, filesPerPartition = 1)
    log.vacuum()
    // offload everything at/below offset 10 per partition: coalesced files
    // span all offsets so nothing qualifies — then offload all
    assert(Admin.offload(log, beforeOffset = 5) == 0)
    val moved = Admin.offload(log, beforeOffset = Long.MaxValue)
    assert(moved == 4)
    assert(log.manifestFiles().get.isEmpty, "snapshot explicitly empty, not legacy")
    assert(log.read().count() == 0)
    assert(Admin.readTiered(log).count() == 100, "cold tier still readable")

    val log2 = freshLog()
    log2.append(batch(0 until 100))
    Admin.coalesceFiles(log2, filesPerPartition = 1)
    log2.vacuum()
    val removed = Admin.truncate(log2)
    assert(removed == 4)
    assert(log2.manifestFiles().get.isEmpty)
    assert(physicalParquet(log2).isEmpty)
    assert(log2.read().count() == 0)
  }

  test("offload crash windows: rows visible in exactly one tier at every instant") {
    val log = freshLog()
    log.append(batch(0 until 100))
    Admin.coalesceFiles(log, filesPerPartition = 1)
    log.vacuum()
    val base = Paths.get(log.name.path(log.root)).toAbsolutePath.normalize

    // crash BETWEEN copy and unreference: simulate by hand-copying one
    // live file into _cold without touching the manifest — readTiered
    // must NOT double-count (the cold copy's rel path is still live)
    val live = log.manifestFiles().get
    val victim = live.head
    val target = base.resolve("_cold").resolve(victim)
    Files.createDirectories(target.getParent)
    Files.copy(base.resolve(victim), target)
    assert(Admin.readTiered(log).count() == 100,
      "half-offloaded copy must not duplicate rows")
    assert(log.read().count() == 100, "hot tier still serves everything")

    // a re-run completes the interrupted offload (REPLACE_EXISTING)
    assert(Admin.offload(log, beforeOffset = Long.MaxValue) == 4)
    assert(log.read().count() == 0)
    assert(Admin.readTiered(log).count() == 100)
    // crash AFTER unreference, before any cleanup: hot originals are
    // unreferenced garbage — still on disk, invisible, vacuum collects
    assert(physicalParquet(log).nonEmpty,
      "originals deferred to vacuum (in-flight readers keep resolving)")
    assert(log.vacuum() == 4)
    assert(physicalParquet(log).isEmpty)
    assert(Admin.readTiered(log).count() == 100, "cold tier intact after vacuum")
  }

  test("coalesce parallelism: the rewrite never funnels through one task") {
    val log = freshLog()
    log.append(batch(0 until 200))
    // capture the shuffle partitioning the rewrite would use: 4 log
    // partitions × 2 files → 8 target cells, not filesPerPartition
    // total (which at the default 1 rewrote the whole topic in 1 task)
    val planned = log.read().repartition(log.numPartitions * 2,
      col(Envelope.Partition), pmod(col(Envelope.Offset), lit(2)))
    assert(planned.rdd.getNumPartitions == 8)
    Admin.coalesceFiles(log, filesPerPartition = 2)
    log.vacuum()
    assert(log.read().count() == 200, "rewrite preserves rows")
    val perPartition = physicalParquet(log).groupBy(_.split("/").head)
    assert(perPartition.values.forall(_.size <= 2),
      s"≤ filesPerPartition files per log partition: $perPartition")
  }

  test("two-level snapshot: above the threshold the F-section moves to manifest-list side files") {
    spark.conf.set("spark.graft.manifestListThreshold", "4")
    try {
      val log = freshLog()
      log.append(batch(0 until 40))
      Admin.coalesceFiles(log, filesPerPartition = 1) // activates the snapshot (4 files, inline)
      val before = contents(log)
      assert(before.size == 40)
      def commitLines(): Seq[String] = {
        val dir = Paths.get(log.name.path(log.root), "_manifest")
        val latest = Files.list(dir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".commit"))
          .toSeq.maxBy(_.getFileName.toString.stripSuffix(".commit").toLong)
        Files.readAllLines(latest).asScala.toSeq.filter(_.nonEmpty)
      }
      assert(commitLines().count(_.startsWith("F,")) == 4, "inline while small")
      // appends push the snapshot past the threshold → L, references only
      log.append(batch(40 until 60))
      log.append(batch(60 until 80))
      val lines = commitLines()
      assert(lines.exists(_.startsWith("L,")), "manifest-list activated")
      assert(!lines.exists(_.startsWith("F,")), "no inline F lines above threshold")
      // side names are content-addressed so publishManifest's byte-level
      // same-epoch race detection still sees differing file lists
      assert(lines.filter(_.startsWith("L,"))
        .forall(_.matches("""L,\d+\.flist\.\d+\.[0-9a-f]{16}""")), lines.toString)
      // the commit file stays O(1): hw lines + a handful of L refs
      assert(lines.size <= 8, s"commit file must stay small, got ${lines.size} lines")
      // resolved two-level read returns the full file set and all rows
      val snapshot = log.manifestFiles().getOrElse(fail("snapshot missing"))
      assert(snapshot.size > 4)
      assert(log.read().count() == 80, "all rows visible through the two-level snapshot")
      assert(before.subsetOf(contents(log)), "pre-threshold rows unchanged")
      // vacuum honors the two-level snapshot: nothing referenced is deleted
      val liveBefore = physicalParquet(log).size
      val deleted = log.vacuum()
      assert(log.read().count() == 80, "vacuum kept every referenced file")
      assert(physicalParquet(log).size == liveBefore - deleted)
      // dropping below the threshold returns to inline form
      Admin.coalesceFiles(log, filesPerPartition = 1)
      assert(commitLines().count(_.startsWith("F,")) == 4, "re-inlined after coalesce")
      assert(log.read().count() == 80)
    } finally spark.conf.unset("spark.graft.manifestListThreshold")
  }
}
