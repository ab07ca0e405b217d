package graft

import graft.log.{DirectCommitProtocol, PathIO}

import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.internal.io.FileNameSpec
import org.apache.spark.sql.functions.col

import java.nio.file.Files

/**
 * The rename-free data-file commit on object-store schemes
 * ([[graft.log.DirectCommitProtocol]]): every engine session registers
 * it as `spark.sql.sources.commitProtocolClass`, so these assertions
 * hold for every epoch/index/output write the streams issue. The
 * headline property, measured in [[MockS3FileSystem.Ops]] request
 * units: a partitioned parquet write to a `mocks3:` root performs
 * ZERO COPY and ZERO rename — data files are conditional PUTs at
 * their final names, the only other write is the `_SUCCESS` manifest.
 */
class DirectCommitSpec extends SparkSpec {
  MockS3FileSystem.register(SparkSpec.session.sparkContext.hadoopConfiguration)
  private val Ops = MockS3FileSystem.Ops

  private def mockRoot(prefix: String): String =
    s"${MockS3FileSystem.Scheme}:" + Files.createTempDirectory(prefix).toString

  test("partitioned overwrite write on mocks3: zero COPY, zero rename, no _temporary") {
    import spark.implicits._
    val root = mockRoot("dc-part")
    val df = (0L until 64L).map(i => (i, i % 4, s"t$i")).toDF("id", "b", "t")
    Ops.reset()
    df.repartition(col("b")).write.mode("overwrite")
      .partitionBy("b").parquet(root)
    val d = Ops.snapshot()
    assert(d("copy") == 0L, s"data commit copied objects: ${Ops.render(d)}")
    assert(d("rename") == 0L, s"data commit renamed: ${Ops.render(d)}")
    assert(d("condPut") >= 4L, "data files must be conditional PUTs")
    assert(d("put") == 1L, "_SUCCESS manifest is the only overwrite PUT")
    assert(d("delete") <= 1L, "only the overwrite's target-dir delete — no " +
      s"per-file deletes on a healthy attempt-0 write: ${Ops.render(d)}")
    val names = PathIO.listDir(PathIO.path(root)).map(_.getName)
    assert(!names.exists(_.startsWith("_temporary")), s"staging dir leaked: $names")
    // read-back equality and manifest fidelity
    val back = spark.read.parquet(root).select("id", "b", "t")
      .as[(Long, Long, String)].collect().toSet
    assert(back == (0L until 64L).map(i => (i, i % 4, s"t$i")).toSet)
    val mf = DirectCommitProtocol.readManifest(root).get
    assert(mf.nonEmpty && mf.forall { case (rel, _) => rel.startsWith("b=") })
    mf.foreach { case (rel, len) =>
      assert(PathIO.size(PathIO.path(root, rel)) == len,
        s"manifest size drifted for $rel")
    }
    // manifest covers exactly the data files on disk
    val onDisk = PathIO.walkStatuses(PathIO.path(root)).filter(!_.isDirectory)
      .map(s => PathIO.relativize(PathIO.qualify(new org.apache.hadoop.fs.Path(root)), s.getPath))
      .filter(!_.split('/').last.startsWith("_")).toSet
    assert(mf.map(_._1).toSet == onDisk)
  }

  test("append job's manifest lists only that job's files; union reads back") {
    import spark.implicits._
    val root = mockRoot("dc-append")
    (0L until 8L).map(i => (i, s"a$i")).toDF("id", "t")
      .coalesce(1).write.mode("overwrite").parquet(root)
    val first = DirectCommitProtocol.readManifest(root).get.map(_._1).toSet
    Ops.reset()
    (8L until 16L).map(i => (i, s"a$i")).toDF("id", "t")
      .coalesce(1).write.mode("append").parquet(root)
    val d = Ops.snapshot()
    assert(d("copy") == 0L && d("rename") == 0L, Ops.render(d))
    val second = DirectCommitProtocol.readManifest(root).get.map(_._1).toSet
    assert(second.nonEmpty && (second & first).isEmpty,
      s"append manifest must carry ONLY the new job's files: $second vs $first")
    assert(spark.read.parquet(root).count() == 16L)
  }

  test("file: scheme stays on the stock committer (empty _SUCCESS, no manifest)") {
    import spark.implicits._
    val root = Files.createTempDirectory("dc-local").toString
    (0L until 8L).toDF("id").coalesce(1).write.mode("overwrite").parquet(root)
    assert(PathIO.exists(PathIO.path(root, "_SUCCESS")))
    assert(DirectCommitProtocol.readManifest(root).isEmpty,
      "stock committer's empty marker must not parse as a manifest")
    assert(spark.read.parquet(root).count() == 8L)
  }

  /** Drive the task-side protocol directly with fabricated attempt
    * contexts — the retry/abort semantics Spark scheduling can't
    * surface deterministically in a local[n] (maxFailures=1) JVM. */
  private def taskCtx(attempt: Int): TaskAttemptContextImpl = {
    val id = new TaskAttemptID(
      new TaskID(new JobID("graft-dc", 1), TaskType.MAP, 3), attempt)
    new TaskAttemptContextImpl(
      spark.sparkContext.hadoopConfiguration, id)
  }

  test("abortTask deletes the attempt's closed files; retry attempt pre-deletes stale finals") {
    val root = mockRoot("dc-retry")
    val proto = new DirectCommitProtocol("job-uuid-1", root, false)
    // attempt 0: close a file, then abort — the file must vanish
    val a0 = taskCtx(0)
    proto.setupTask(a0)
    val f0 = proto.newTaskTempFile(a0, Some("b=1"), FileNameSpec("", ".parquet"))
    PathIO.writeString(new org.apache.hadoop.fs.Path(f0), "complete-bytes")
    assert(PathIO.exists(new org.apache.hadoop.fs.Path(f0)))
    proto.abortTask(a0)
    assert(!PathIO.exists(new org.apache.hadoop.fs.Path(f0)),
      "failed attempt's closed file must be deleted by abortTask")
    // executor-death window: the stale complete file is still there when
    // the RETRY starts — newTaskTempFile(attempt>0) must clear it so the
    // conditional PUT can re-create
    PathIO.writeString(new org.apache.hadoop.fs.Path(f0), "stale-from-dead-executor")
    val a1 = taskCtx(1)
    proto.setupTask(a1)
    val f1 = proto.newTaskTempFile(a1, Some("b=1"), FileNameSpec("", ".parquet"))
    assert(f1 == f0, "retry must target the same final name")
    assert(!PathIO.exists(new org.apache.hadoop.fs.Path(f1)),
      "retry must pre-delete the dead predecessor's file")
    val ok = PathIO.conditionalPutCreate(PathIO.fs(new org.apache.hadoop.fs.Path(f1)),
      new org.apache.hadoop.fs.Path(f1), "retried-bytes".getBytes)
    assert(ok, "conditional PUT must succeed after the pre-delete")
  }

  test("stream epoch replay on mocks3: the overwrite rewrite is idempotent and the manifest tracks the replay's files") {
    import spark.implicits._
    val d = (0L until 64L)
      .map(i => (i, 10L + i % 7)).toDF("doc_id", "n_tokens")
    val root = Files.createTempDirectory("dc-replay-root")
    val ckpt = Files.createTempDirectory("dc-replay-ckpt")
    val out = s"${MockS3FileSystem.Scheme}:" +
      Files.createTempDirectory("dc-replay-out")
    def slice(i: Int): Unit = {
      val tmp = Files.createTempDirectory("dc-replay-slice")
      d.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val part = {
        val l = java.nio.file.Files.list(tmp)
        try l.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        finally l.close()
      }
      java.nio.file.Files.move(part, root.resolve(f"slice_$i%02d.parquet"))
      java.nio.file.Files.setLastModifiedTime(
        root.resolve(f"slice_$i%02d.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 10000L + i * 2000L)): Unit
    }
    (0 until 3).foreach(slice)
    def run(): Unit = {
      val q = graft.ext.SeqPackStream.run(
        spark.readStream.schema(d.schema).option("maxFilesPerTrigger", 1)
          .option("pathGlobFilter", "*.parquet").parquet(root.toString),
        out, ckpt.toString, seqLen = 32L, tokensCol = "n_tokens")
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val spans = spark.read.parquet(out).count()
    val mf2 = DirectCommitProtocol.readManifest(s"$out/epoch=2").get.map(_._1).toSet
    // crash-replay the last batch: drop its checkpoint commit, rerun
    java.nio.file.Files.deleteIfExists(ckpt.resolve("commits").resolve("2"))
    java.nio.file.Files.deleteIfExists(ckpt.resolve("commits").resolve(".2.crc"))
    MockS3FileSystem.Ops.reset()
    run()
    val dAfter = MockS3FileSystem.Ops.snapshot()
    assert(dAfter("copy") == 0L && dAfter("rename") == 0L,
      s"replay must stay rename-free: ${MockS3FileSystem.Ops.render(dAfter)}")
    assert(spark.read.parquet(out).count() === spans,
      "replayed epoch must rewrite, not append duplicates")
    val mf2b = DirectCommitProtocol.readManifest(s"$out/epoch=2").get.map(_._1).toSet
    assert(mf2b.nonEmpty && (mf2b & mf2).isEmpty,
      "the replay's manifest must name the NEW job's files")
    // no stale first-run files survive beside the replay's
    val onDisk = graft.log.PathIO.listStatusSeq(
        graft.log.PathIO.path(s"$out/epoch=2"))
      .map(_.getPath.getName).filter(!_.startsWith("_")).toSet
    assert(onDisk === mf2b, s"stale files beside the replay: ${onDisk -- mf2b}")
  }

  test("token-bound write: readManifest verifies the manifest is THIS job's; a racer's overwrite fails loudly") {
    import spark.implicits._
    val root = mockRoot("dc-token")
    val token = "tok-abc-123"
    val sc = spark.sparkContext
    sc.setLocalProperty(DirectCommitProtocol.TokenProp, token)
    try (0L until 8L).toDF("id").coalesce(1).write.mode("overwrite").parquet(root)
    finally sc.setLocalProperty(DirectCommitProtocol.TokenProp, null)
    // the bound token verifies; a wrong expectation fails loudly
    assert(DirectCommitProtocol.readManifest(root,
      expectToken = Some(token)).get.nonEmpty)
    assert(DirectCommitProtocol.readManifest(root).get.nonEmpty,
      "no-expectation read accepts any job's manifest")
    intercept[IllegalArgumentException] {
      DirectCommitProtocol.readManifest(root, expectToken = Some("other-job"))
    }
    // a racing same-directory writer OVERWRITES _SUCCESS (last PUT wins
    // on an object store): the first writer's verified read must fail
    // loudly instead of adopting the racer's file list as its own
    val racer = DirectCommitProtocol.ManifestHeader + " tok-racer\nb=0/x.parquet\t5"
    PathIO.writeString(PathIO.path(root, DirectCommitProtocol.SuccessName), racer)
    intercept[IllegalArgumentException] {
      DirectCommitProtocol.readManifest(root, expectToken = Some(token))
    }
    // an UNtokened manifest (stock engine elsewhere) also fails a
    // tokened expectation
    PathIO.writeString(PathIO.path(root, DirectCommitProtocol.SuccessName),
      DirectCommitProtocol.ManifestHeader + "\nb=0/x.parquet\t5")
    intercept[IllegalArgumentException] {
      DirectCommitProtocol.readManifest(root, expectToken = Some(token))
    }
  }

  test("abortJob deletes every committed-task file the driver collected") {
    val root = mockRoot("dc-abort")
    val proto = new DirectCommitProtocol("job-abort-1", root, false)
    // two tasks commit, then the job fails (e.g. a third task exhausts
    // retries): abortJob must sweep the committed tasks' files — the
    // caller's replay can't always reach them (append-mode staging)
    val files = (0 until 2).map { split =>
      val id = new TaskAttemptID(
        new TaskID(new JobID("graft-dc", 9), TaskType.MAP, split), 0)
      val ctx = new TaskAttemptContextImpl(
        spark.sparkContext.hadoopConfiguration, id)
      proto.setupTask(ctx)
      val f = proto.newTaskTempFile(ctx, Some(s"b=$split"),
        FileNameSpec("", ".parquet"))
      PathIO.writeString(new org.apache.hadoop.fs.Path(f), s"bytes-$split")
      proto.onTaskCommit(proto.commitTask(ctx))
      f
    }
    files.foreach(f => assert(PathIO.exists(new org.apache.hadoop.fs.Path(f))))
    proto.abortJob(new org.apache.hadoop.mapreduce.task.JobContextImpl(
      spark.sparkContext.hadoopConfiguration, new JobID("graft-dc", 9)))
    files.foreach(f => assert(!PathIO.exists(new org.apache.hadoop.fs.Path(f)),
      s"abortJob left committed-task file $f"))
    assert(!PathIO.exists(PathIO.path(root, DirectCommitProtocol.SuccessName)))
  }

  test("absolute-path partitions refuse loudly in direct mode") {
    val root = mockRoot("dc-abs")
    val proto = new DirectCommitProtocol("job-uuid-2", root, false)
    val a0 = taskCtx(0)
    proto.setupTask(a0)
    intercept[UnsupportedOperationException] {
      proto.newTaskTempFileAbsPath(a0, "/abs/elsewhere", FileNameSpec("", ".parquet"))
    }
  }
}
