package graft

import graft.ext.IndexIO
import graft.log.PathIO

import java.nio.file.Files

/**
 * The full seam crash-schedule suite ([[SeamSchedules]]) on `mocks3:` —
 * a rename-REPLACING, link-less FileSystem with S3 semantics
 * ([[MockS3FileSystem]]): rename is per-object copy+delete and never
 * fails-if-exists, `create(overwrite=false)` is an atomic conditional
 * PUT. Green here means the commit protocols (manifest publish, txn
 * markers, ack staging, index fold, AMO markers, replay staging) never
 * lean on rename atomicity — the storage class most 100 TB corpora
 * live on is inside the contract, not excluded by a scaladoc caveat.
 */
class ObjectStoreSeamSpec extends SeamSchedules {
  MockS3FileSystem.register(SparkSpec.session.sparkContext.hadoopConfiguration)

  override def schemeName: String = MockS3FileSystem.Scheme

  test("fixture sanity: rename replaces an existing object and links don't exist") {
    val root = makeRoot("mocks3-fixture")
    val a = PathIO.path(root, "a")
    val b = PathIO.path(root, "b")
    PathIO.writeString(a, "A")
    PathIO.writeString(b, "B")
    val f = PathIO.fs(a)
    assert(!f.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem])
    // the adversarial property: rename silently REPLACES — any protocol
    // that used rename as its commit point would corrupt here
    assert(f.rename(a, b))
    assert(PathIO.readString(b) == "A")
    assert(!PathIO.exists(a))
  }

  test("atomicCreate takes the conditional-PUT branch: complete-or-absent, 412 on conflict") {
    val root = makeRoot("mocks3-cput")
    val target = PathIO.path(root, "m.commit")
    val f = PathIO.fs(target)
    assert(PathIO.conditionalPutCreate(f, target, "A".getBytes))
    assert(PathIO.readString(target) == "A")
    assert(!PathIO.conditionalPutCreate(f, target, "B".getBytes))
    assert(PathIO.readString(target) == "A", "412 loser never replaces")
    // no staged leftovers beside the object
    assert(PathIO.listDir(PathIO.path(root)).map(_.getName) == Seq("m.commit"))
  }

  test("index fold crash windows on mocks3: uncommitted data discards; committed pointer heals") {
    import spark.implicits._
    val root = makeRoot("mocks3-fold")
    // two plain epochs of a toy (doc_id, band_hash, bp) level
    def level(epoch: Int, ids: Seq[Long]) =
      ids.map(i => (i, i * 7L, i % 4)).toDF("doc_id", "band_hash", "bp")
        .write.partitionBy("bp").parquet(s"$root/epoch=$epoch")
    level(0, Seq(1L, 2L))
    level(1, Seq(3L, 4L))
    val like = Seq((0L, 0L, 0L)).toDF("doc_id", "band_hash", "bp")
    def readIds() = IndexIO.read(spark, root, like)
      .select("doc_id").as[Long].collect().toSet
    assert(readIds() == Set(1L, 2L, 3L, 4L))
    // window A: fold data fully written, pointer NOT committed — resume
    // discards the data, sources intact
    Seq((9L, 9L, 1L)).toDF("doc_id", "band_hash", "bp")
      .write.partitionBy("bp").parquet(s"$root/_fold-1-0/epoch=1")
    IndexIO.resume(root)
    assert(!PathIO.exists(PathIO.path(root, "_fold-1-0")))
    assert(readIds() == Set(1L, 2L, 3L, 4L))
    // the real fold commits by pointer (no rename anywhere on this fs)
    IndexIO.compact(spark, root, "bp", upToEpoch = 1L)
    assert(IndexIO.committedEpochs(root) == Seq(1L))
    assert(readIds() == Set(1L, 2L, 3L, 4L))
    // window B: pointer committed, cleanup unfinished — a stale plain
    // epoch dir ≤ upTo must be EXCLUDED from reads (no double count)
    // and swept by resume
    level(0, Seq(1L, 2L)) // resurrect a subsumed source dir
    assert(IndexIO.read(spark, root, like).count() == 4,
      "subsumed plain epoch must not double-count")
    IndexIO.resume(root)
    assert(!PathIO.exists(PathIO.path(root, "epoch=0")))
    assert(readIds() == Set(1L, 2L, 3L, 4L))
    // a later epoch + rebucket: new generation supersedes, old fold swept
    level(2, Seq(5L))
    IndexIO.rebucket(spark, root, "bp", "band_hash", 8)
    assert(IndexIO.committedEpochs(root) == Seq(2L))
    assert(readIds() == Set(1L, 2L, 3L, 4L, 5L))
    val names = PathIO.listDir(PathIO.path(root)).map(_.getName)
    assert(names.count(_.startsWith("_live-")) == 1, names)
    assert(names.count(_.startsWith("_fold-")) == 1, names)
    assert(spark.read.option("basePath", s"$root/_fold-2-1")
      .parquet(s"$root/_fold-2-1/epoch=2")
      .where(org.apache.spark.sql.functions.expr("bp != band_hash % 8"))
      .count() == 0, "rebucket must recompute the bucket column")
  }
}
