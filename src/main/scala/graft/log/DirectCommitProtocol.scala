package graft.log

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.FileNameSpec
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol

import scala.collection.mutable.ArrayBuffer

/**
 * Rename-free parquet/data-file commit for OBJECT-STORE output paths —
 * the committer leg of the engine's no-rename posture. The control
 * plane (manifests, index pointers, txn markers, stream state) already
 * commits via [[PathIO.atomicCreate]] conditional PUTs only, but data
 * files rode Hadoop's FileOutputCommitter v1, whose task-dir renames an
 * object store decomposes into per-object COPY + DELETE: the round-15
 * `os_stream` cost record measured copy=264 + rename=167 per
 * steady-state clean-corpus batch — server-side byte copies of the
 * batch's ENTIRE data, every batch, forever (the classic S3A-committer
 * gap). The reference engineers its cold tier around exactly this:
 * block-sized direct uploads with no rename anywhere
 * (tiered-storage/jcloud/src/main/java/org/apache/bookkeeper/mledger/
 * offload/jcloud/impl/BlobStoreManagedLedgerOffloader.java).
 *
 * Mechanism: when the job's output path is on an object-store scheme
 * ([[PathIO.isObjectStore]]), task files are written DIRECTLY at their
 * final paths — `<out>/<partitionDir>/part-<split>-<jobUUID><ext>` —
 * names already globally unique per job (the jobUUID), so no staging
 * directory and no rename exists anywhere in the write. PUT-at-close
 * object semantics make every file complete-or-absent: a crashed task
 * attempt materializes NOTHING (parquet creates with overwrite=false —
 * a conditional PUT). Job commit writes the `_SUCCESS` marker, whose
 * body is a manifest of THIS JOB's committed data files
 * (`<relative-path>\t<bytes>` per line — [[DirectCommitProtocol.readManifest]])
 * so downstream catalogs can learn the file set without re-listing the
 * directory. File sizes come from ONE `listStatus` per output
 * directory at job commit, not a per-file `getFileStatus` — on a wide
 * job that turns O(files) HEADs into O(partition-dirs) LISTs. When the
 * caller bound the write to a job token
 * ([[DirectCommitProtocol.TokenProp]], a thread-local SparkContext
 * property), the token is embedded in the `_SUCCESS` header so the
 * caller can verify the manifest it reads back belongs to the job it
 * just ran — two same-directory writers racing the overwrite-PUT of
 * `_SUCCESS` are detected loudly instead of one batch silently
 * vanishing. On every other scheme (local, HDFS — where rename is free
 * and atomic) the protocol is byte-identical to the stock
 * [[SQLHadoopMapReduceCommitProtocol]] via super-delegation, as it is
 * for dynamic-partition-overwrite jobs (whose swap semantics genuinely
 * need staging) and when speculative execution is enabled (two live
 * same-name attempts would race their conditional PUTs; the engine
 * never enables speculation, and the guard makes the degradation safe
 * rather than silent).
 *
 * Failure model in direct mode:
 *  - task attempt crash mid-write: nothing materialized (PUT-at-close);
 *    the retry writes the same final name.
 *  - task attempt failed AFTER its files closed (e.g. a post-write
 *    error): the files exist and are complete. [[abortTask]] deletes
 *    them; if the executor died before abort could run, the NEXT
 *    attempt (attemptNumber > 0) deletes each final path before
 *    re-creating it — so the steady-state (attempt 0) write path pays
 *    ZERO extra requests and retries still converge.
 *  - job abort: [[abortJob]] deletes every file named by the task
 *    commits the driver collected via [[onTaskCommit]]; files from
 *    tasks that never reached commitTask were either never
 *    materialized or deleted by their own abort/retry. A task commit
 *    the driver never RECEIVED (executor death between close and the
 *    commit message) leaves its files as unreferenced orphans — as
 *    does a driver death before abortJob can run at all.
 *  - driver death between task commits and job commit: no `_SUCCESS`,
 *    and the engine's callers never expose an uncommitted write —
 *    every epoch/index write is gated by a checkpoint offset or an
 *    atomicCreate'd pointer published only after the write returns.
 *    Orphans left by the two windows above are swept by the caller:
 *    a replayed batch's `mode("overwrite")` delete for index/epoch
 *    writes, and the TopicLog side by snapshot-mode invisibility plus
 *    `vacuum()` (a direct-staged topic is ALWAYS in snapshot mode —
 *    [[TopicLog.stageAppend]] bootstraps the snapshot before the first
 *    direct write precisely so these orphans can never be mistaken for
 *    committed data).
 *
 * Registered per session via `spark.sql.sources.commitProtocolClass`
 * (see [[DirectCommitProtocol.Key]]); constructor shape is the
 * `FileCommitProtocol.instantiate` 3-arg contract.
 */
class DirectCommitProtocol(jobId: String, path: String,
                           dynamicPartitionOverwrite: Boolean)
  extends SQLHadoopMapReduceCommitProtocol(
    jobId, path, dynamicPartitionOverwrite) {

  /** Decided once on the driver at instantiation (serialized to
    * tasks): direct mode needs an object-store output path, static
    * overwrite semantics, and no speculative execution. */
  private val direct: Boolean =
    PathIO.isObjectStore(new Path(path)) && !dynamicPartitionOverwrite &&
      !Option(org.apache.spark.SparkEnv.get)
        .exists(_.conf.getBoolean("spark.speculation", defaultValue = false))

  /** Final absolute paths of files this TASK closed — executor side
    * only, rebuilt by [[setupTask]]. */
  @transient private var taskFiles: ArrayBuffer[String] = _

  /** Driver-side ledger of every committed task's files, fed by
    * [[onTaskCommit]] — what [[abortJob]] deletes on job failure.
    * Driver-only state; executors never touch it. */
  @transient private lazy val driverCommitted = ArrayBuffer.empty[String]

  override def setupJob(jobContext: JobContext): Unit =
    if (!direct) super.setupJob(jobContext)

  override def setupTask(taskContext: TaskAttemptContext): Unit =
    if (direct) taskFiles = ArrayBuffer.empty[String]
    else super.setupTask(taskContext)

  override def newTaskTempFile(taskContext: TaskAttemptContext,
                               dir: Option[String],
                               spec: FileNameSpec): String =
    if (!direct) super.newTaskTempFile(taskContext, dir, spec)
    else {
      val name = getFilename(taskContext, spec)
      val file = dir.map(d => new Path(new Path(path, d), name))
        .getOrElse(new Path(path, name))
      // a RETRY may find a complete file from a failed-after-close
      // predecessor whose abortTask never ran (executor death): delete
      // it so the conditional PUT can re-create. Attempt 0 — the only
      // path a healthy job takes — issues no request here. The attempt
      // number comes from Spark's TaskContext: FileFormatWriter seeds
      // the Hadoop TaskAttemptID's id field with the GLOBAL task
      // counter (unique per execution, > 0 on healthy first attempts),
      // so getId cannot distinguish a retry.
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.attemptNumber())
        .getOrElse(taskContext.getTaskAttemptID.getId)
      if (attempt > 0)
        PathIO.fs(file).delete(file, false): Unit
      taskFiles += file.toString
      file.toString
    }

  override def newTaskTempFileAbsPath(taskContext: TaskAttemptContext,
                                      absoluteDir: String,
                                      spec: FileNameSpec): String =
    if (!direct) super.newTaskTempFileAbsPath(taskContext, absoluteDir, spec)
    else throw new UnsupportedOperationException(
      "DirectCommitProtocol: absolute-path partition locations are not " +
        "supported in direct (object-store) mode — they commit by rename")

  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage =
    if (!direct) super.commitTask(taskContext)
    else
      // paths only — sizes are gathered at job commit with one LIST per
      // output directory, so the executor pays no per-file stat here
      // (the write-side request profile is PUTs alone)
      new TaskCommitMessage(taskFiles.toVector)

  override def abortTask(taskContext: TaskAttemptContext): Unit =
    if (!direct) super.abortTask(taskContext)
    else Option(taskFiles).toSeq.flatten.foreach { f =>
      val p = new Path(f)
      try PathIO.fs(p).delete(p, false): Unit
      catch { case _: java.io.IOException => () }
    }

  override def onTaskCommit(taskCommit: TaskCommitMessage): Unit =
    if (!direct) super.onTaskCommit(taskCommit)
    else driverCommitted.synchronized {
      driverCommitted ++= taskCommit.obj.asInstanceOf[Vector[String]]
    }

  override def commitJob(jobContext: JobContext,
                         taskCommits: Seq[TaskCommitMessage]): Unit =
    if (!direct) super.commitJob(jobContext, taskCommits)
    else {
      val out = new Path(path)
      val base = PathIO.qualify(out).toString
      val files = taskCommits.flatMap(_.obj.asInstanceOf[Vector[String]])
      // sizes from ONE listStatus per distinct parent directory (a
      // partition dir on a partitioned write): O(dirs) LISTs instead of
      // O(files) HEADs. A committed file absent from its directory
      // listing is a protocol violation (S3 listings are strongly
      // consistent) — fail the commit rather than record a bad length.
      val sizeByPath: Map[String, Long] = files.map(new Path(_))
        .groupBy(_.getParent).flatMap { case (parent, ps) =>
          val listed = PathIO.listStatusSeq(parent)
            .map(st => PathIO.qualify(st.getPath).toString -> st.getLen).toMap
          ps.map { p =>
            val q = PathIO.qualify(p).toString
            q -> listed.getOrElse(q, sys.error(
              s"direct commit: committed file missing from its directory " +
                s"listing: $p"))
          }
        }
      val lines = files.map { f =>
        val q = PathIO.qualify(new Path(f)).toString
        require(q.startsWith(base),
          s"direct commit produced a file outside the job dir: $f")
        val rel = q.stripPrefix(base).stripPrefix("/")
        s"$rel\t${sizeByPath(q)}"
      }
      // the caller may have bound this write to a token (thread-local,
      // so concurrent writes in one session can't cross-contaminate);
      // embedding it lets the caller verify the manifest it reads back
      // is THIS job's, not a racing same-directory writer's
      val token = org.apache.spark.sql.SparkSession.getActiveSession
        .flatMap(s => Option(
          s.sparkContext.getLocalProperty(DirectCommitProtocol.TokenProp)))
      val header = token
        .map(t => s"${DirectCommitProtocol.ManifestHeader} $t")
        .getOrElse(DirectCommitProtocol.ManifestHeader)
      PathIO.writeString(new Path(out, DirectCommitProtocol.SuccessName),
        (header +: lines).mkString("\n"))
    }

  override def abortJob(jobContext: JobContext): Unit =
    if (!direct) super.abortJob(jobContext)
    else {
      // delete every file of every task commit the driver saw; commits
      // in flight at driver death are the caller-swept orphan window
      // (class doc failure model)
      val files = driverCommitted.synchronized(driverCommitted.toVector)
      files.foreach { f =>
        val p = new Path(f)
        try PathIO.fs(p).delete(p, false): Unit
        catch { case _: java.io.IOException => () }
      }
    }
}

object DirectCommitProtocol {
  /** Session conf key + value every engine entrypoint sets. */
  val Key = "spark.sql.sources.commitProtocolClass"
  val Value: String = classOf[DirectCommitProtocol].getName

  /** SparkContext LOCAL property (thread-scoped) a caller sets to bind
    * the next write on this thread to a job identity it can verify via
    * [[readManifest]]'s `expectToken`. */
  val TokenProp = "graft.direct.token"

  val SuccessName = "_SUCCESS"
  private[graft] val ManifestHeader = "graft-direct-v1"

  /** Parse a `_SUCCESS` body written by this protocol: Some(relative
    * path → bytes, this job's files only) — None when the marker is
    * absent or a stock committer's empty marker (callers fall back to
    * listing). When `expectToken` is set, a manifest written by a
    * DIFFERENT job (no token, or another token — a racing
    * same-directory writer overwrote `_SUCCESS` after our commit) fails
    * loudly instead of letting the caller adopt the racer's file list
    * as its own. */
  def readManifest(dir: String,
                   expectToken: Option[String] = None): Option[Seq[(String, Long)]] = {
    val p = PathIO.path(dir, SuccessName)
    if (!PathIO.exists(p)) return None
    PathIO.readLines(p) match {
      case header +: rest if header == ManifestHeader ||
          header.startsWith(ManifestHeader + " ") =>
        val token = if (header == ManifestHeader) None
          else Some(header.substring(ManifestHeader.length + 1))
        expectToken.foreach { want =>
          require(token.contains(want),
            s"direct-commit manifest at $p belongs to a different job " +
              s"(token ${token.getOrElse("<none>")}, expected $want) — " +
              "concurrent writers raced the _SUCCESS commit")
        }
        Some(rest.filter(_.nonEmpty).map { l =>
          l.split('\t') match {
            case Array(rel, len) => (rel, len.toLong)
            case _ => sys.error(s"corrupt direct-commit manifest line in $p: $l")
          }
        })
      case _ => None
    }
  }
}
