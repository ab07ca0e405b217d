package graft

import graft.ext.{BatchTune, IndexIO}
import graft.log.PathIO
import org.apache.spark.sql.functions._

/**
 * Round-18 optimization internals:
 *  - `IndexIO.compact(gcNow = false)` — the fold that runs CONCURRENTLY
 *    with a batch defers subsumed-dir deletion to the next resume, so
 *    readers planned against the pre-fold view never lose files. The
 *    committed view must be exact (no double-count) in the deferred
 *    window, and the next resume must finish the cleanup.
 *  - `IndexIO.committedBytes` — the index-size signal BatchTune folds
 *    into the batch shuffle width.
 *  - `BatchTune.adapt(indexBytes)` — width = clamp(max(batch-derived,
 *    index-derived), 2, session ceiling); no file leaf → session width.
 */
class DeferredFoldSpec extends SparkSpec {
  import spark.implicits._

  private val like = Seq((0L, 0L, 0L)).toDF("doc_id", "band_hash", "bp")

  private def writeEpoch(root: String, e: Long, rows: Seq[(Long, Long)]): Unit =
    rows.toDF("doc_id", "band_hash")
      .withColumn("bp", pmod(col("band_hash"), lit(4L)))
      .repartition(1)
      .write.partitionBy("bp").parquet(s"$root/epoch=$e")

  private def view(root: String): Set[(Long, Long)] =
    IndexIO.read(spark, root, like)
      .select("doc_id", "band_hash").as[(Long, Long)].collect().toSet

  test("gcNow=false fold: exact view in the deferred window, cleanup on next resume") {
    val root = java.nio.file.Files.createTempDirectory("deferred-fold").toString
    val r0 = Seq((1L, 10L), (2L, 21L))
    val r1 = Seq((3L, 32L), (4L, 43L))
    writeEpoch(root, 0L, r0)
    writeEpoch(root, 1L, r1)
    IndexIO.compact(spark, root, "bp", upToEpoch = 1L, gcNow = false)
    // pointer committed, sources NOT deleted: both plain epoch dirs must
    // still exist (that is the whole point — concurrent readers keep
    // their files), yet the committed view must count each row ONCE
    assert(PathIO.exists(PathIO.path(root, "epoch=0")), "epoch=0 deleted early")
    assert(PathIO.exists(PathIO.path(root, "epoch=1")), "epoch=1 deleted early")
    assert(view(root) == (r0 ++ r1).toSet)
    assert(IndexIO.read(spark, root, like).count() == 4L, "double-counted rows")
    // next batch's resume performs the deferred cleanup
    IndexIO.resume(root)
    assert(!PathIO.exists(PathIO.path(root, "epoch=0")), "deferred GC missed epoch=0")
    assert(!PathIO.exists(PathIO.path(root, "epoch=1")), "deferred GC missed epoch=1")
    assert(view(root) == (r0 ++ r1).toSet, "cleanup changed the view")
    // a re-fold over the lone fold is a no-op (replay-of-folding-batch)
    IndexIO.compact(spark, root, "bp", upToEpoch = 1L, gcNow = false)
    assert(view(root) == (r0 ++ r1).toSet)
  }

  test("committedBytes covers plain epochs and the fold view") {
    val root = java.nio.file.Files.createTempDirectory("cbytes").toString
    assert(IndexIO.committedBytes(root) == 0L, "missing level must read 0")
    writeEpoch(root, 0L, Seq((1L, 10L)))
    writeEpoch(root, 1L, Seq((2L, 21L)))
    val plainBytes = IndexIO.committedBytes(root)
    assert(plainBytes > 0L)
    IndexIO.compact(spark, root, "bp", upToEpoch = 1L)
    val foldedBytes = IndexIO.committedBytes(root)
    // same rows, consolidated layout: bytes stay in the same ballpark
    // and never read 0 (the signal BatchTune widens index joins with)
    assert(foldedBytes > 0L)
  }

  test("BatchTune.adapt: max(batch, index) width, clamped to the session ceiling") {
    val dir = java.nio.file.Files.createTempDirectory("btune").toString
    spark.range(10).select(col("id").as("doc_id"), lit("t").as("text"))
      .write.parquet(s"$dir/in")
    // isolated session: adapt stashes the FIRST-seen width as its clamp
    // ceiling, and the shared test session must not inherit this spec's
    // 32-wide configuration
    val s2 = spark.newSession()
    val key = "spark.sql.shuffle.partitions"
    s2.conf.set(key, "32")
    val batch = s2.read.parquet(s"$dir/in")
    // tiny single-split batch, no index: 4 reducers per input split
    BatchTune.adapt(batch)
    assert(s2.conf.get(key).toInt == 4,
      s"tiny batch must narrow to 4, got ${s2.conf.get(key)}")
    // huge index signal: width rises but never past the stashed ceiling
    BatchTune.adapt(batch, indexBytes = 1L << 40)
    assert(s2.conf.get(key).toInt == 32,
      "index-derived width must clamp to the stashed session ceiling")
    // moderate index between floor and ceiling: 320 MB / 16 MB + 2 = 22
    BatchTune.adapt(batch, indexBytes = 320L << 20)
    assert(s2.conf.get(key).toInt == 22,
      s"320 MB index should widen to 22, got ${s2.conf.get(key)}")
  }
}
