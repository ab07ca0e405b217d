package graft.log

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.collection.JavaConverters._

/**
 * Durable, manifest-gated ack store for one (topic, subscription) — the
 * storage half of the reference's pending-ack subsystem
 * (pulsar-broker/.../transaction/pendingack/impl/PendingAckHandleImpl.java:
 * txn-scoped acks buffered invisibly, made durable by the transaction
 * commit marker; released on abort). SURVEY §2.12's "txn-ack = cursor
 * update in the same manifest".
 *
 * Layout mirrors [[TopicLog]] exactly so the SAME static commit
 * machinery applies ([[TopicLog.atomicCreate]],
 * [[TopicLog.completeStagedMoves]], [[TopicLog.recoverStaging]]):
 *
 * {{{ <topicPath>/_subs/<sub>/acks/{_manifest,_staging,part-*.parquet} }}}
 *
 * `_subs` is underscore-prefixed, so topic readers never see ack rows as
 * messages; within the ack dir, staged epochs live under `_staging/` —
 * invisible to [[read]] until the manifest commits and the files move.
 * Because the layout is TopicLog's, a [[Txn]] marker line can reference
 * an ack log by PATH and [[Txn.recover]] replays it through the
 * unchanged produce-recovery code path: one marker is the single commit
 * point for produces AND acks — the reference's consume-process-produce
 * atomicity (Transaction.java:30-93).
 *
 * Ack rows carry (partition, offset) — the individual-ack granularity of
 * ManagedCursorImpl.individualDeletedMessages; [[AckState helpers in
 * graft.streaming]] fold them into markDelete positions / backlog.
 * Single-writer per (topic, subscription), the same posture as topic
 * appends.
 */
final class AckLog(val spark: SparkSession, val topicPath: String, val sub: String) {
  import TopicLog.StagedAppend

  val basePath: String = s"$topicPath/_subs/$sub/acks"
  private val manifestDir = Paths.get(basePath, "_manifest")

  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("partition",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("offset",
        org.apache.spark.sql.types.LongType)))

  private def committedEpochs(): Seq[Long] =
    if (!Files.exists(manifestDir)) Seq.empty
    else Files.list(manifestDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong).toSeq.sorted

  /** Phase 1: write the ack rows under `_staging/<epoch>/` — invisible
    * until [[publish]] moves them. Manifest content = the staged file
    * list (the idempotent-republish verification token), or the empty
    * marker for an empty ack batch so the [[Txn]] marker line never
    * loses its 4th field. */
  def stageAck(acks: DataFrame): StagedAppend = {
    val epoch = committedEpochs().lastOption.getOrElse(-1L) + 1L
    val stagingDir = Paths.get(basePath, "_staging", epoch.toString)
    // a crashed prior attempt may have left files here — same rule as
    // TopicLog.clearStaging: staged-but-unpublished is invisible garbage
    if (Files.exists(stagingDir)) {
      val w = Files.walk(stagingDir)
      try w.iterator().asScala.toSeq.reverse.foreach(p =>
        Files.deleteIfExists(p))
      finally w.close()
    }
    val n = acks.count()
    acks.select(col("partition").cast("int"), col("offset").cast("long"))
      .write.mode("append").parquet(stagingDir.toString)
    val rels =
      if (!Files.exists(stagingDir)) Seq.empty[String]
      else {
        val w = Files.walk(stagingDir)
        try w.iterator().asScala.toSeq
          .filter(_.toString.endsWith(".parquet"))
          .map(p => stagingDir.relativize(p).toString).sorted
        finally w.close()
      }
    val content =
      if (rels.isEmpty) TopicLog.EmptySnapshotMarker else rels.mkString("\n")
    StagedAppend(epoch, content, n)
  }

  /** Phase 2: commit — first-writer-wins manifest create (idempotent for
    * identical content: txn recovery republishes), then move staged
    * files into the readable layout. */
  def publish(staged: StagedAppend): Unit = {
    Files.createDirectories(manifestDir)
    val target = manifestDir.resolve(s"${staged.epoch}.commit")
    if (!Files.exists(target))
      TopicLog.atomicCreate(target, staged.manifestLines.getBytes): Unit
    val existing = new String(Files.readAllBytes(target))
    require(existing == staged.manifestLines,
      s"ack epoch ${staged.epoch} raced a DIFFERENT commit on $basePath")
    TopicLog.completeStagedMoves(basePath, staged.epoch)
  }

  /** Non-transactional ack: stage + publish in one call (the plain
    * consumer acknowledge path). */
  def ack(acks: DataFrame): Long = {
    val staged = stageAck(acks)
    publish(staged)
    staged.count
  }

  /** Committed acks: (partition, offset). Staged epochs are invisible —
    * an open or aborted transaction's acks never surface here. */
  def read(): DataFrame = {
    val hasData =
      Files.exists(Paths.get(basePath)) && {
        val w = Files.walk(Paths.get(basePath))
        try w.iterator().asScala.exists { p =>
          p.toString.endsWith(".parquet") &&
            !Paths.get(basePath).relativize(p).iterator().asScala
              .exists(_.getFileName.toString.startsWith("_"))
        } finally w.close()
      }
    if (!hasData)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(basePath)
  }

  /** Staged-but-uncommitted acks — the PENDING set (PendingAckHandle's
    * in-flight view): a dispatcher that must not redeliver messages
    * pending inside an open transaction anti-joins this. Committed
    * epochs' leftovers (mid-publish crash) are excluded; they belong to
    * [[read]] after recovery. */
  def pendingAcks(): DataFrame = {
    val stagingRoot = Paths.get(basePath, "_staging")
    val dirs =
      if (!Files.exists(stagingRoot)) Seq.empty[String]
      else Files.list(stagingRoot).iterator().asScala.toSeq
        .filter(d => !Files.exists(manifestDir.resolve(s"${d.getFileName}.commit")))
        .filter { d =>
          val w = Files.walk(d)
          try w.iterator().asScala.exists(_.toString.endsWith(".parquet"))
          finally w.close()
        }
        .map(_.toString).sorted
    dirs.foldLeft(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)) {
      (acc, d) =>
        acc.unionByName(spark.read.schema(schema)
          .option("ignoreMissingFiles", "true").parquet(d))
    }
  }

  /** Heal a crash between manifest commit and staged-file moves. */
  def recover(): Int = TopicLog.recoverStaging(basePath)
}
