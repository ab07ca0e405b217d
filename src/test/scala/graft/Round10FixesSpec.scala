package graft

import graft.ext.{Graph, MinHash}
import graft.log.Txn

import java.nio.file.{Files, Paths}
import scala.collection.JavaConverters._

/**
 * Round-10 review fixes, pinned by behavior:
 *  - Txn.markerEpochs fails SAFE on an unreadable-but-present marker
 *    (r9 ADVICE medium: swallowing the IOException would unprotect a
 *    committed transaction's staged data and let the vacuum delete it);
 *  - MinHash signature caches follow the previous-call-release
 *    lifecycle and releaseCaches drops the last handle (VERDICT r9
 *    "unpersist discipline" — no pinned blocks after a dedup pass);
 *  - reliable-checkpoint connectedComponents GCs every round's
 *    checkpoint directory except the final one (r9 ADVICE: Spark never
 *    deletes checkpoint data on its own).
 */
class Round10FixesSpec extends SparkSpec {
  import spark.implicits._

  test("vacuumAll aborts loudly on a present-but-unreadable commit marker") {
    val root = Files.createTempDirectory("graft-txn-badmarker").toString
    // a directory named *.committed is listed as a marker but cannot be
    // read as a file — the canonical "present but unreadable" shape
    Files.createDirectories(Paths.get(root, "_txn", "bad.committed"))
    intercept[java.io.IOException] {
      Txn.vacuumAll(root, olderThanMs = 1000L)
    }
  }

  test("signature caches: previous-call release, then releaseCaches drops the last") {
    val docs = Seq(
      (1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "x y z w q r s"),
      (4L, "x y z w q r t"), (5L, "m n o p q u v"))
      .toDF("doc_id", "text")
    // earlier suites in the shared session may have left registered
    // signature caches — their release by this test's first call would
    // skew the relative counts, so start from a clean module state
    MinHash.releaseCaches(spark)
    def persisted: Int = spark.sparkContext.getPersistentRDDs.size
    val base = persisted
    MinHash.lshCandidates(docs).count()
    assert(persisted == base + 1, "first call pins exactly one signature cache")
    MinHash.lshCandidates(docs.limit(4)).count()
    assert(persisted == base + 1,
      "second call must release the first call's cache (one per kind)")
    MinHash.simhashPairs(docs).count()
    assert(persisted == base + 2, "simhash is a separate kind")
    // SAME input as the previous minhash call: CacheManager caches by
    // canonical plan, so the re-derived signature hits the existing
    // entry — the lifecycle must NOT unpersist it from under the new
    // call (persist() was a no-op on the already-cached plan)
    val again = MinHash.lshCandidates(docs.limit(4))
    assert(persisted == base + 2,
      "same-plan re-registration must not destroy the live cache")
    again.count()
    assert(persisted == base + 2)
    MinHash.releaseCaches(spark)
    assert(persisted == base, "releaseCaches drops every signature cache")
  }

  test("manifest pruning bounds history, spares txn-marked and staged epochs, changes no data") {
    import graft.log.{Admin, TopicLog}
    import graft.model.{Envelope, TopicName}
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-prune").toString
    val log = new TopicLog(spark, root, TopicName.parse("t"))
    def batch(ids: Range) =
      ids.map(i => (s"u${i % 5}", s"v$i", "p0", i.toLong)).toDF(
        Envelope.Key, Envelope.Value, Envelope.ProducerName, Envelope.SequenceId)
        .withColumn(Envelope.PublishTime, timestamp_seconds(col(Envelope.SequenceId)))
    (0 until 12).foreach(i => log.append(batch(i * 5 until i * 5 + 5)))
    val before = log.read().count()
    val hwBefore = log.highWater()
    def manifests() = {
      val d = Paths.get(root, "public", "default", "t", "_manifest")
      Files.list(d).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".commit")).toSeq.sorted
    }
    assert(manifests().size == 12)
    // marker-protected epoch survives: write a txn marker referencing
    // epoch 2 of this topic (the committed-awaiting-recover state)
    val base = Paths.get(root, "public", "default", "t").toAbsolutePath
    Files.createDirectories(Paths.get(root, "_txn"))
    Files.writeString(Paths.get(root, "_txn", "txn-test.committed"),
      s"$base\t2\t5\t0,-1")
    // staged-epoch guard: a leftover staging tree for epoch 3 protects it
    Files.createDirectories(Paths.get(base.toString, "_staging", "3"))
    val deleted = Admin.pruneManifests(root, keepLast = 4)
    assert(deleted > 0)
    val left = manifests().map(_.stripSuffix(".commit").toLong).sorted
    assert(left.contains(2L), "txn-marked epoch must survive")
    assert(left.contains(3L), "staged epoch must survive")
    assert(left.takeRight(4) == Seq(8L, 9L, 10L, 11L), "newest keepLast survive")
    assert(left.size == 6)
    // data and cursor state are untouched; the next append continues
    assert(log.read().count() == before)
    assert(log.highWater() == hwBefore)
    log.append(batch(60 until 65))
    assert(log.read().count() == before + 5)
    // the new epoch pushes exactly one more unprotected manifest past
    // the window; after that the sweep is idempotent
    assert(Admin.pruneManifests(root, keepLast = 4) == 1)
    assert(Admin.pruneManifests(root, keepLast = 4) == 0)
  }

  test("reliable-checkpoint CC leaves only the final round's blocks") {
    val dir = Files.createTempDirectory("graft-cc-gc").toString
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L), (5L, 6L), (6L, 7L))
      .toDF("u", "v")
    val cc = Graph.connectedComponents(edges, checkpointDir = Some(dir))
    assert(cc.count() == 12)
    assert(cc.filter($"node" === 4L).head().getLong(1) == 1L)
    val rddDirs = {
      val w = Files.walk(Paths.get(dir))
      try w.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .toList
      finally w.close()
    }
    assert(rddDirs.size == 1,
      s"all but the final round's checkpoint dir must be GC'd, found $rddDirs")
    // the surviving blocks are the ones the returned frame reads
    assert(cc.count() == 12)
  }
}
