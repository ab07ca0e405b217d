package graft.log

import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
 * appends. All side-channel IO rides [[PathIO]] (Hadoop FileSystem).
 */
final class AckLog(val spark: SparkSession, val topicPath: String, val sub: String) {
  import TopicLog.StagedAppend

  val basePath: String = s"$topicPath/_subs/$sub/acks"
  private val manifestDir = PathIO.path(basePath, "_manifest")

  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("partition",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("offset",
        org.apache.spark.sql.types.LongType)))

  private def committedEpochs(): Seq[Long] =
    if (!PathIO.exists(manifestDir)) Seq.empty
    else TopicLog.listDir(manifestDir)
      .map(_.getName).filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong).sorted

  /** Phase 1: write the ack rows under `_staging/<epoch>/` — invisible
    * until [[publish]] moves them. Manifest content = the staged file
    * list (the idempotent-republish verification token), or the empty
    * marker for an empty ack batch so the [[Txn]] marker line never
    * loses its 4th field.
    *
    * DELIBERATELY move-based even on object stores (unlike
    * [[TopicLog.stageAppend]]'s direct staging): ack rows are two
    * columns of (int, long) — bytes-trivial — so the publish-time
    * per-file move costs a few hundred bytes of server-side copy,
    * while converting would add the record/merge machinery's extra
    * REQUESTS to every ack batch. Revisit only if ack batches ever
    * carry payload-scale data. */
  def stageAck(acks: DataFrame): StagedAppend = {
    val epoch = committedEpochs().lastOption.getOrElse(-1L) + 1L
    val stagingDir = PathIO.path(basePath, "_staging", epoch.toString)
    // a crashed prior attempt may have left files here — same rule as
    // TopicLog.clearStaging: staged-but-unpublished is invisible garbage
    PathIO.deleteTree(stagingDir): Unit
    val n = acks.count()
    acks.select(col("partition").cast("int"), col("offset").cast("long"))
      .write.mode("append").parquet(stagingDir.toString)
    val rels =
      if (!PathIO.exists(stagingDir)) Seq.empty[String]
      else PathIO.walkAll(stagingDir)
        .filter(_.getName.endsWith(".parquet"))
        .map(p => PathIO.relativize(stagingDir, p)).sorted
    val content =
      if (rels.isEmpty) TopicLog.EmptySnapshotMarker else rels.mkString("\n")
    StagedAppend(epoch, content, n)
  }

  /** Phase 2: commit — first-writer-wins manifest create (idempotent for
    * identical content: txn recovery republishes), then move staged
    * files into the readable layout. */
  def publish(staged: StagedAppend): Unit = {
    PathIO.mkdirs(manifestDir)
    val target = PathIO.child(manifestDir, s"${staged.epoch}.commit")
    if (!PathIO.exists(target))
      TopicLog.atomicCreate(target, staged.manifestLines.getBytes): Unit
    val existing = new String(PathIO.readBytes(target))
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
      PathIO.exists(PathIO.path(basePath)) &&
        PathIO.existsFileWhere(PathIO.path(basePath)) { rel =>
          rel.endsWith(".parquet") && !rel.split('/').exists(_.startsWith("_"))
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
    val stagingRoot = PathIO.path(basePath, "_staging")
    val dirs =
      if (!PathIO.exists(stagingRoot)) Seq.empty[String]
      else TopicLog.listDir(stagingRoot)
        .filter(d => !PathIO.exists(PathIO.child(manifestDir, s"${d.getName}.commit")))
        .filter(d => PathIO.existsFileWhere(d)(_.endsWith(".parquet")))
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

  // -------------------------------------------------------------------
  // Compaction: bounded cursor state (reference ManagedCursorImpl —
  // the durable cursor is markDeletePosition + individualDeletedMessages
  // ABOVE it, never every historical ack; persistentmarkDeletePosition
  // advances and the prefix is forgotten). Without this the ack log
  // grows with total consumption forever — unbounded at 100 TB.
  // -------------------------------------------------------------------

  private val cursorDir = PathIO.path(basePath, "_cursor")

  /** The compaction floor per partition (markDelete at the last
    * compaction; −1 when never compacted): every offset ≤ floor is
    * acked BY CONTRACT and its individual rows may no longer exist. */
  def cursor(): Map[Int, Long] = {
    val epochs =
      if (!PathIO.exists(cursorDir)) Seq.empty[Long]
      else TopicLog.listDir(cursorDir)
        .map(_.getName).filter(_.endsWith(".commit"))
        .map(_.stripSuffix(".commit").toLong).sorted
    epochs.lastOption.map { e =>
      PathIO.readLines(PathIO.child(cursorDir, s"$e.commit"))
        .filter(_.nonEmpty).map { line =>
          val Array(p, o) = line.split(","); p.toInt -> o.toLong
        }.toMap
    }.getOrElse(Map.empty)
  }

  private def floorsDf: DataFrame = {
    val fl = cursor().toSeq
    if (fl.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("partition",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("floor",
            org.apache.spark.sql.types.LongType))))
    else spark.createDataFrame(spark.sparkContext.parallelize(
        fl.map { case (p, o) => org.apache.spark.sql.Row(p, o) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("partition",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("floor",
          org.apache.spark.sql.types.LongType))))
  }

  /** Floor-aware mark-delete position: the highest offset with every
    * offset at/below it acked, where offsets ≤ the compaction floor are
    * acked by contract. Before any compaction (floor −1 everywhere)
    * this is exactly AckState.markDeletePosition. Returns
    * (partition, mark_delete); a partition whose only coverage is the
    * floor itself reports the floor. */
  def markDelete(): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("partition").orderBy("offset")
    val above = read().distinct()
      .join(broadcast(floorsDf), Seq("partition"), "left_outer")
      .withColumn("floor", coalesce(col("floor"), lit(-1L)))
      .filter(col("offset") > col("floor"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("offset") === col("floor") + col("rn"))
      .groupBy("partition").agg(max("offset").as("md_above"))
    floorsDf.join(above, Seq("partition"), "full_outer")
      .select(col("partition"),
        greatest(coalesce(col("floor"), lit(-1L)),
          coalesce(col("md_above"), lit(-1L))).as("mark_delete"))
      .filter(col("mark_delete") >= 0L)
  }

  /** Floor-aware unacked backlog per partition over `log` rows:
    * offsets ≤ the floor are acked by contract, offsets above it are
    * checked against the surviving individual acks. Equals
    * AckState.backlog on a never-compacted log. */
  def backlogAgainst(log: DataFrame): DataFrame =
    log.select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))
      .join(broadcast(floorsDf), Seq("partition"), "left_outer")
      .filter(col("floor").isNull || col("offset") > col("floor"))
      .drop("floor")
      .join(read().distinct().hint("shuffle_hash"),
        Seq("partition", "offset"), "left_anti")
      .groupBy("partition").agg(count(lit(1)).as("backlog"))

  /**
   * Compact: advance the cursor floor to the current mark-delete and
   * drop every individual ack at/below it; only acks ABOVE the new
   * floor survive as rows. Crash-safe without a file snapshot because
   * ack rows are idempotent facts — every consumer distincts — so the
   * possible crash states are all benign: survivors published but old
   * files not yet deleted = duplicate rows (harmless); cursor written
   * but deletes incomplete = sub-floor rows linger (excluded by the
   * floor filter). Single-writer per subscription, like [[ack]].
   * Returns the number of individual ack rows dropped.
   */
  def compact(): Long = {
    // bounded driver read: one row per partition (config-scale)
    val md = markDelete().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (md.isEmpty) return 0L
    val base = PathIO.path(basePath)
    val oldFiles: Seq[org.apache.hadoop.fs.Path] =
      PathIO.walkAll(base)
        .filter { p =>
          p.getName.endsWith(".parquet") &&
            !PathIO.relativize(base, p).split('/').exists(_.startsWith("_"))
        }
    val mdDf = spark.createDataFrame(spark.sparkContext.parallelize(
        md.toSeq.map { case (p, o) => org.apache.spark.sql.Row(p, o) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("partition",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("md",
          org.apache.spark.sql.types.LongType))))
    val survivors = read().distinct()
      .join(broadcast(mdDf), Seq("partition"), "left_outer")
      .filter(col("md").isNull || col("offset") > col("md"))
      .drop("md")
    val before = read().count()
    // survivors fully materialize into the staged epoch BEFORE any old
    // file is touched; publish moves them into the readable layout.
    // Take the surviving count from the STAGED append — recomputing the
    // lazy plan after the deletes below would read vanished files.
    val staged = stageAck(survivors)
    publish(staged)
    // cursor epoch: latest wins; first-writer-wins per epoch
    PathIO.mkdirs(cursorDir)
    val cEpoch = (if (!PathIO.exists(cursorDir)) Seq.empty[Long]
      else TopicLog.listDir(cursorDir)
        .map(_.getName).filter(_.endsWith(".commit"))
        .map(_.stripSuffix(".commit").toLong)).sorted.lastOption
      .getOrElse(-1L) + 1L
    val merged = (cursor() ++ md).toSeq.sorted // floors only advance
      .map { case (p, o) => s"$p,$o" }.mkString("\n")
    TopicLog.atomicCreate(PathIO.child(cursorDir, s"$cEpoch.commit"),
      merged.getBytes): Unit
    oldFiles.foreach(p =>
      try { PathIO.deleteIfExists(p); () } catch { case _: Throwable => () })
    before - staged.count
  }
}
