package graft.log

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.{FileCommitProtocol, FileNameSpec}
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
 * directory. On every other scheme (local, HDFS — where rename is free
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
 *  - job abort: [[abortJob]] deletes every file named by the collected
 *    task commits; files from tasks that never reached commitTask were
 *    either never materialized or deleted by their own abort/retry.
 *  - driver death between task commits and job commit: no `_SUCCESS`,
 *    and the engine's callers never expose an uncommitted write —
 *    every epoch/index write is gated by a checkpoint offset or an
 *    atomicCreate'd pointer published only after the write returns,
 *    and a replayed batch's `mode("overwrite")` delete sweeps the
 *    orphans before rewriting.
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

  /** Final (absolute path, bytes) of files this TASK closed — executor
    * side only, rebuilt by [[setupTask]]. */
  @transient private var taskFiles: ArrayBuffer[String] = _

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
    else {
      // stat once at close time so the job manifest carries real sizes
      // (split planning and footer reads need lengths; recording them
      // here saves every downstream catalog a per-file HEAD)
      val entries = taskFiles.map { f =>
        val p = new Path(f)
        (f, PathIO.fs(p).getFileStatus(p).getLen)
      }.toVector
      new TaskCommitMessage(entries)
    }

  override def abortTask(taskContext: TaskAttemptContext): Unit =
    if (!direct) super.abortTask(taskContext)
    else Option(taskFiles).toSeq.flatten.foreach { f =>
      val p = new Path(f)
      try PathIO.fs(p).delete(p, false): Unit
      catch { case _: java.io.IOException => () }
    }

  override def commitJob(jobContext: JobContext,
                         taskCommits: Seq[TaskCommitMessage]): Unit =
    if (!direct) super.commitJob(jobContext, taskCommits)
    else {
      val out = new Path(path)
      val base = PathIO.qualify(out).toString
      val files = taskCommits.flatMap(
        _.obj.asInstanceOf[Vector[(String, Long)]])
      val lines = files.map { case (f, len) =>
        val q = PathIO.qualify(new Path(f)).toString
        require(q.startsWith(base),
          s"direct commit produced a file outside the job dir: $f")
        val rel = q.stripPrefix(base).stripPrefix("/")
        s"$rel\t$len"
      }
      PathIO.writeString(new Path(out, DirectCommitProtocol.SuccessName),
        (DirectCommitProtocol.ManifestHeader +: lines).mkString("\n"))
    }

  override def abortJob(jobContext: JobContext): Unit =
    if (!direct) super.abortJob(jobContext)
    else () // per-file cleanup happened in each task's abort/retry; a
            // file whose task committed before the job died is swept by
            // the caller's replay overwrite (class doc failure model)
}

object DirectCommitProtocol {
  /** Session conf key + value every engine entrypoint sets. */
  val Key = "spark.sql.sources.commitProtocolClass"
  val Value: String = classOf[DirectCommitProtocol].getName

  val SuccessName = "_SUCCESS"
  private[graft] val ManifestHeader = "graft-direct-v1"

  /** Parse a `_SUCCESS` body written by this protocol: Some(relative
    * path → bytes, this job's files only) — None when the marker is
    * absent or a stock committer's empty marker (callers fall back to
    * listing). */
  def readManifest(dir: String): Option[Seq[(String, Long)]] = {
    val p = PathIO.path(dir, SuccessName)
    if (!PathIO.exists(p)) return None
    PathIO.readLines(p) match {
      case ManifestHeader +: rest =>
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
