package graft

import graft.ext.{IndexIO, MixtureStream, SeqPackStream}
import graft.log.{AckLog, PathIO, TopicLog, Topics, Txn}
import graft.model.{Envelope, TopicName}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * The distributed-filesystem seam's crash schedules, parameterized by
 * scheme: every root below is spelled with an explicit scheme, so
 * NOTHING can fall back to `java.nio` path resolution — existence
 * probes, listings, manifest commits, txn markers, staged-file moves,
 * vacuum, the index fold commit, and the AT_MOST_ONCE ack markers all
 * resolve through the Hadoop FileSystem API. [[PathIOSeamSpec]] runs
 * them on `file:` (RawLocalFileSystem — the HDFS-contract stand-in);
 * [[ObjectStoreSeamSpec]] runs the SAME schedules on `mocks3:`
 * (rename-replacing, link-less, conditional-PUT — S3 semantics), the
 * storage class the commit protocols previously excluded.
 */
trait SeamSchedules extends SparkSpec {
  import spark.implicits._

  /** Scheme under test ("file", "mocks3"). */
  def schemeName: String

  /** A fresh scheme-ful root. */
  def makeRoot(prefix: String): String =
    s"$schemeName:" + Files.createTempDirectory(prefix).toString

  test(s"EpochState chains (seq-pack offset, mixture totals) on a $schemeName: root") {
    val root = makeRoot("graft-seam-estate")
    // the mixture totals chain: commit, strictly-prior read, identical
    // replay tolerated, divergence loud, prune to two entries — all
    // through PathIO.atomicCreate on this scheme
    val mix = PathIO.child(PathIO.path(root), "mix").toString
    MixtureStream.commitTotals(mix, 0L, Map("a" -> 5L))
    assert(MixtureStream.priorTotals(mix, 1L) == Map("a" -> 5L))
    assert(MixtureStream.priorTotals(mix, 0L) == Map.empty)
    MixtureStream.commitTotals(mix, 0L, Map("a" -> 5L)) // replay: tolerated
    intercept[RuntimeException] {
      MixtureStream.commitTotals(mix, 0L, Map("a" -> 6L))
    }
    MixtureStream.commitTotals(mix, 1L, Map("a" -> 8L))
    MixtureStream.commitTotals(mix, 2L, Map("a" -> 8L))
    val names = PathIO.listDir(PathIO.path(mix)).map(_.getName)
      .filter(_.startsWith("_mixstate-")).toSet
    assert(names == Set("_mixstate-1", "_mixstate-2"), names.toString)
    // the seq-pack offset chain rides the same helper
    val sp = PathIO.child(PathIO.path(root), "sp").toString
    SeqPackStream.commitOffset(sp, 0L, 42L)
    assert(SeqPackStream.priorOffset(sp, 1L) == 42L)
    assert(SeqPackStream.priorOffset(sp, 0L) == 0L)
  }

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 7}", s"payload-$i", s"prod-${i % 3}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")

  test(s"PathIO primitives on a $schemeName:-scheme path") {
    val root = makeRoot("graft-seam-prim")
    val dir = PathIO.path(root, "a/b")
    PathIO.mkdirs(dir)
    assert(PathIO.exists(dir) && PathIO.isDirectory(dir))
    val f = PathIO.child(dir, "x.txt")
    PathIO.writeString(f, "hello\nworld")
    assert(PathIO.readString(f) == "hello\nworld")
    assert(PathIO.readLines(f) == Seq("hello", "world"))
    assert(PathIO.size(f) == 11L)
    // no .crc side files: checksum shadows would corrupt
    // directory-content protocols (manifest listings, epoch-dir counts)
    assert(PathIO.listDir(dir).map(_.getName) == Seq("x.txt"))
    // walk: pre-order, start included, parents before children
    val walk = PathIO.walkAll(PathIO.path(root)).map(_.getName)
    assert(walk.indexOf(PathIO.path(root).getName) == 0)
    assert(walk.indexOf("a") < walk.indexOf("b"))
    assert(walk.indexOf("b") < walk.indexOf("x.txt"))
    // relativize over qualified URIs
    assert(PathIO.relativize(PathIO.path(root), f) == "a/b/x.txt")
    // qualification is stable (idempotent) for scheme-ful spellings
    assert(PathIO.qualify(PathIO.qualify(root).toString).toString ==
      PathIO.qualify(root).toString)
    // short-circuiting emptiness probe honors the hidden-segment rule
    assert(PathIO.existsFileWhere(PathIO.path(root))(_.endsWith(".txt")))
    assert(!PathIO.existsFileWhere(PathIO.path(root))(_.endsWith(".parquet")))
    // moveReplace: atomic latest-wins replace (FileContext OVERWRITE on
    // rename-atomic schemes; overwrite PUT on object stores)
    val g = PathIO.child(dir, "y.txt")
    PathIO.writeString(g, "old")
    val tmp = PathIO.child(dir, "y.tmp")
    PathIO.writeString(tmp, "new")
    PathIO.moveReplace(tmp, g)
    assert(PathIO.readString(g) == "new")
    assert(!PathIO.exists(tmp))
    // deleteIfExists refuses a non-empty directory (the nio contract
    // tree deletion relies on), deleteTree removes it
    intercept[java.io.IOException] { PathIO.deleteIfExists(dir) }
    assert(PathIO.deleteTree(PathIO.path(root, "a")))
    assert(!PathIO.exists(dir))
  }

  test(s"atomicCreate on $schemeName: first writer wins, loser reports, no replacement") {
    val root = makeRoot("graft-seam-ac")
    val target = PathIO.path(root, "0.commit")
    assert(PathIO.atomicCreate(target, "A".getBytes))
    assert(PathIO.readString(target) == "A")
    assert(!PathIO.atomicCreate(target, "B".getBytes),
      "existing target must report loss")
    assert(PathIO.readString(target) == "A", "existing target never replaced")
    // no tmp leftovers either way
    assert(PathIO.listDir(PathIO.path(root)).map(_.getName) == Seq("0.commit"))
  }

  test(s"TopicLog roundtrip + manifest prune + vacuumStaged on a $schemeName: root") {
    val root = makeRoot("graft-seam-log")
    val log = new TopicLog(spark, root, TopicName.parse("t-seam"), 2)
    log.append(batch(0 until 20))
    log.append(batch(20 until 30))
    assert(log.read().count() == 30)
    assert(log.highWater().values.sum > 0)
    // staged-but-unpublished data is invisible, then vacuumable
    log.stageAppend(batch(30 until 40)): Unit
    assert(log.read().count() == 30)
    val future = System.currentTimeMillis() + 3600 * 1000L
    assert(TopicLog.vacuumStaged(log.name.path(root), 60000L,
      nowMs = () => future) == 1)
    assert(log.read().count() == 30)
    // manifest history bounded through the seam
    (0 until 3).foreach(i => log.append(batch((40 + i) until (41 + i))): Unit)
    assert(log.pruneManifests(keepLast = 2) > 0)
    assert(log.read().count() == 33)
    // topic discovery walks the scheme-ful root
    assert(Topics.list(root).map(_.topic) == Seq("t-seam"))
  }

  test(s"txn crash window on a $schemeName: root: marker present, publish missing -> recover heals") {
    val root = makeRoot("graft-seam-txn")
    val t1 = new TopicLog(spark, root, TopicName.parse("t1"), 2)
    val t2 = new TopicLog(spark, root, TopicName.parse("t2"), 2)
    // stage both topics and write the marker MANUALLY (the crash point:
    // marker committed, neither manifest published)
    val s1 = t1.stageAppend(batch(0 until 8))
    val s2 = t2.stageAppend(batch(100 until 110))
    val markerDir = PathIO.path(root, "_txn")
    PathIO.mkdirs(markerDir)
    val content = Seq(
      Seq(t1.name.path(root), s1.epoch.toString, s1.count.toString,
        s1.manifestLines.replace("\n", ";")).mkString("\t"),
      Seq(t2.name.path(root), s2.epoch.toString, s2.count.toString,
        s2.manifestLines.replace("\n", ";")).mkString("\t")).mkString("\n")
    assert(PathIO.atomicCreate(
      PathIO.child(markerDir, "txn-seam.committed"), content.getBytes))
    assert(t1.read().count() == 0, "pre-recovery: nothing visible")
    // the marker protects the staged epochs from the janitor...
    val future = System.currentTimeMillis() + 3600 * 1000L
    val (healedByVacuum, dropped) =
      Txn.vacuumAll(root, Txn.DefaultTimeoutMs, nowMs = () => future)
    assert(dropped == 0, "marker-protected epochs must survive the sweep")
    // ...and recovery (run inside vacuumAll) completed the commit
    assert(healedByVacuum == 2)
    assert(t1.read().count() == 8)
    assert(t2.read().count() == 10)
    // fully-published marker retired; second sweep is a no-op
    assert(!PathIO.exists(PathIO.child(markerDir, "txn-seam.committed")))
    assert(Txn.vacuumAll(root, Txn.DefaultTimeoutMs,
      nowMs = () => future) == ((0, 0)))
  }

  test(s"txn produce+ack commit and AckLog compaction on a $schemeName: root") {
    val root = makeRoot("graft-seam-ack")
    val t = new TopicLog(spark, root, TopicName.parse("t-ack"), 2)
    t.append(batch(0 until 12))
    val acks = new AckLog(spark, t.name.path(root), "sub-seam")
    val out = new TopicLog(spark, root, TopicName.parse("t-out"), 2)
    Txn.begin(root)
      .produce(out, batch(200 until 206))
      .ack(acks, t.read().filter(col(Envelope.Offset) <= 2)
        .select(col(Envelope.Partition).as("partition"),
          col(Envelope.Offset).as("offset")))
      .commit()
    assert(out.read().count() == 6)
    val acked = acks.read().count()
    assert(acked > 0)
    assert(acks.pendingAcks().count() == 0)
    // cursor compaction commits its floor through the seam
    acks.compact(): Unit
    val floors = acks.cursor()
    assert(floors.nonEmpty, "compaction must persist a cursor floor")
    assert(acks.markDelete().count() > 0)
  }

  test(s"near-dup stream on $schemeName:: persisted index dedups across runs; fold commit survives") {
    val base = Files.createTempDirectory("graft-seam-nd")
    val srcDir = base.resolve("src"); Files.createDirectories(srcDir)
    val idx = s"$schemeName:" + base.resolve("idx").toString
    val out = s"$schemeName:" + base.resolve("out").toString
    val ckpt = s"$schemeName:" + base.resolve("ckpt").toString
    def writeSlice(name: String, docs: Seq[(Long, String)], mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-seam-slice")
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val part = {
        val l = Files.list(tmp)
        try l.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        finally l.close()
      }
      Files.move(part, srcDir.resolve(name))
      Files.setLastModifiedTime(srcDir.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime)): Unit
    }
    val t0 = System.currentTimeMillis() - 60000L
    val text = "the quick brown fox jumps over the lazy dog again and again"
    writeSlice("s0.parquet", Seq((1L, text), (2L, "completely different words here entirely")), t0)
    val schema = spark.read.parquet(s"$srcDir/s0.parquet").schema
    def run() = graft.ext.NearDupStream.run(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(srcDir.toString),
      idx, out, ckpt, threshold = 0.8, compactEvery = Some(2))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 2)
    // SECOND run, new slice: doc 3 duplicates doc 1 — only the
    // PERSISTED scheme-ful index knows doc 1, so a silent empty-index
    // read (the pre-seam java.nio bug) would keep it
    writeSlice("s1.parquet", Seq((3L, text), (4L, "unrelated fresh content words")),
      t0 + 4000L)
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    val kept = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L),
      s"doc 3 must be dropped against the persisted scheme-ful index, got $kept")
    // THIRD slice triggers the scheduled compaction (epochId 2 % 2 == 0):
    // epochs 0 and 1 fold through the scheme-ful pointer commit, and
    // the folded index still drops duplicates of run-1 docs
    writeSlice("s2.parquet", Seq((5L, text), (6L, "yet more novel content beyond")),
      t0 + 8000L)
    val q3 = run()
    try q3.processAllAvailable() finally q3.stop()
    val kept3 = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(kept3 == Set(1L, 2L, 4L, 6L),
      s"doc 5 must be dropped against the FOLDED scheme-ful index, got $kept3")
    // index epoch metadata stayed bounded: one fold entry + the batch's own
    assert(IndexIO.committedEpochs(s"$idx/bands") == Seq(1L, 2L))
  }

  test(s"two healers race the same staged epoch on a $schemeName: root without losing rows") {
    // concurrent publishManifest calls (publisher + recovery healer) on
    // scheme-ful paths must resolve per-file move races silently with
    // every row visible exactly once
    val root = makeRoot("graft-seam-race")
    val log = new TopicLog(spark, root, TopicName.parse("t-race"), 2)
    log.append(batch(0 until 10))
    val staged = log.stageAppend(batch(10 until 40))
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to 2).foreach { _ =>
      pool.execute(() => {
        gate.await()
        try log.publishManifest(staged)
        catch { case t: Throwable => errs.add(t) }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"concurrent healers must not throw: ${errs.peek()}")
    assert(log.read().count() == 40)
    // staging fully drained, no leftovers for a later healer
    assert(!PathIO.exists(PathIO.path(log.name.path(root), "_staging",
      staged.epoch.toString)))
  }

  test(s"orderedReplaySource stages on a $schemeName:-scheme dir: monotone bucket mtimes, no tmp leftovers") {
    val staging = makeRoot("graft-seam-replay")
    val rows = Seq(  // deliberately unordered event times
      (1L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-01-04 00:00:00")),
      (4L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("id", "ts")
    val src = graft.streaming.Functions.orderedReplaySource(
      rows, "ts", staging, buckets = 4)
    // flat parquet files only — the distributed move drained the hidden
    // tmp tree and deleteTree removed it
    val entries = PathIO.listDir(PathIO.path(staging)).map(_.getName)
    assert(entries.forall(n => n.startsWith("replay_b") && n.endsWith(".parquet")),
      s"unexpected staging entries: $entries")
    assert(!entries.exists(_.startsWith("_replay_tmp")), s"tmp leaked: $entries")
    // pinned mtimes strictly increase with the bucket index — the
    // property the watermark-ordering contract rests on
    val byBucket = PathIO.listStatusSeq(PathIO.path(staging))
      .map(st => st.getPath.getName.substring(8, 12).toInt -> st.getModificationTime)
      .sortBy(_._1)
    byBucket.sliding(2).foreach {
      case Seq((b1, t1), (b2, t2)) =>
        if (b1 != b2) assert(t1 < t2, s"bucket $b1 mtime !< bucket $b2")
      case _ => ()
    }
    // the stream replays every row, oldest bucket first
    val out = Files.createTempDirectory("seam-replay-out")
    val ckpt = Files.createTempDirectory("seam-replay-ckpt")
    val q = src.writeStream.option("checkpointLocation", ckpt.toString)
      .format("parquet").option("path", out.toString).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out.toString).count() == 4)
  }

  test(s"AT_MOST_ONCE ack markers ride a $schemeName:-scheme checkpoint") {
    val base = Files.createTempDirectory("graft-seam-amo")
    val srcDir = base.resolve("src"); Files.createDirectories(srcDir)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(srcDir.resolve("s0").toString)
    val ckpt = s"$schemeName:" + base.resolve("ckpt").toString
    val sink = base.resolve("sink").toString
    val schema = spark.read.parquet(srcDir.resolve("s0").toString).schema
    val q = graft.streaming.Functions.run(
      spark.readStream.schema(schema).parquet(srcDir.resolve("s0").toString),
      identity, sink, ckpt,
      guarantee = graft.streaming.Functions.Guarantee.AtMostOnce)
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(sink).count() == 2)
    // the marker landed beside the scheme-ful checkpoint
    val ackDir = PathIO.path(ckpt, "_acks")
    assert(PathIO.exists(ackDir))
    assert(PathIO.listDir(ackDir).exists(_.getName.endsWith(".acked")))
  }
}

/** The seam schedules on `file:` — RawLocalFileSystem, the
  * HDFS-contract stand-in (shares the FileSystem contract with
  * DistributedFileSystem; rename overwrite-vs-fail differences are
  * handled inside PathIO). */
class PathIOSeamSpec extends SeamSchedules {
  override def schemeName: String = "file"

  test("atomicCreate rename branch: first writer wins on exclusive-rename filesystems") {
    // drive the REMOTE-scheme (HDFS-class) protocol directly (the local
    // fast path takes the hard-link branch): verify-after catches a
    // same-call replacement, and an existing target is never replaced
    val root = makeRoot("graft-seam-acr")
    val target = PathIO.path(root, "0.commit")
    val f = PathIO.fs(target)
    assert(PathIO.renameAtomicCreate(f, target, "A".getBytes))
    assert(PathIO.readString(target) == "A")
    assert(!PathIO.renameAtomicCreate(f, target, "B".getBytes),
      "existing target must report loss")
    assert(PathIO.readString(target) == "A", "existing target never replaced")
    assert(PathIO.listDir(PathIO.path(root)).map(_.getName) == Seq("0.commit"))
  }

  test("bare and file:-scheme spellings of one path qualify identically") {
    val root = makeRoot("graft-seam-q")
    assert(PathIO.qualify(root.stripPrefix("file:")).toString ==
      PathIO.qualify(root).toString)
  }
}
