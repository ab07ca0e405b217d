package graft.log

import graft.model.{Envelope, TopicName}
import graft.functions.Murmur3Pulsar
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.JavaConverters._

/**
 * Parquet-backed topic log: the storage layer replacing the reference's
 * BookKeeper managed ledger (managed-ledger/.../ManagedLedgerImpl.java:781
 * `asyncAddEntry`) with an offset-assigning atomic append.
 *
 * Layout: `<root>/<tenant>/<namespace>/<topic>/partition=<i>/...parquet`
 * plus a `_manifest/` directory of commit files. Readers only see data
 * referenced by committed manifests (READ_COMMITTED semantics — the Spark
 * stand-in for the reference's transaction buffer markers, SURVEY.md §2.12).
 *
 * Scale notes (100 TB):
 *  - the log is hive-partitioned on `partition` so per-partition consumers
 *    prune files at planning time;
 *  - offsets are assigned per partition with a window over only the incoming
 *    batch plus a tiny per-partition max-offset manifest read — never a scan
 *    of the existing log;
 *  - appends are append-only parquet writes; the manifest commit is a single
 *    atomic file move (same pattern as a Spark streaming sink commit log).
 */
object TopicLog {
  /** A staged (data-written, not yet reader-visible) append: the manifest
    * content is the commit token — publishing it is one atomic file move.
    * Used by [[graft.log.Txn]] for multi-topic atomicity. */
  final case class StagedAppend(epoch: Long, manifestLines: String, count: Long) {
    def manifestPath: String = s"$epoch.commit"
  }

  /** Move `_staging/<epoch>/` files into the readable partition dirs,
    * preserving relative paths; idempotent (skips already-moved files). */
  private[log] def completeStagedMoves(basePath: String, epoch: Long): Unit = {
    val stagingDir = Paths.get(basePath, "_staging", epoch.toString)
    if (!Files.exists(stagingDir)) return
    Files.walk(stagingDir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
      .foreach { p =>
        val target = Paths.get(basePath).resolve(stagingDir.relativize(p))
        Files.createDirectories(target.getParent)
        Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
      }
    // clean the emptied staging tree
    Files.walk(stagingDir).iterator().asScala.toSeq.reverse
      .foreach(p => try Files.deleteIfExists(p) catch { case _: Throwable => })
  }

  /** Recovery: complete moves for every staged epoch whose manifest is
    * committed (crash between manifest write and file moves). Epochs with
    * NO manifest stay staged — invisible garbage, never visible rows.
    * Returns epochs healed. */
  def recoverStaging(topicPath: String): Int = {
    val stagingRoot = Paths.get(topicPath, "_staging")
    if (!Files.exists(stagingRoot)) return 0
    var healed = 0
    Files.list(stagingRoot).iterator().asScala.toSeq.foreach { dir =>
      val epoch = dir.getFileName.toString
      if (Files.exists(Paths.get(topicPath, "_manifest", s"$epoch.commit"))) {
        completeStagedMoves(topicPath, epoch.toLong)
        healed += 1
      }
    }
    healed
  }
}

final class TopicLog(val spark: SparkSession, val root: String, val name: TopicName,
                     val numPartitions: Int = 4) {

  private val basePath = name.path(root)
  private val manifestDir = Paths.get(basePath, "_manifest")

  /** Committed epochs, ascending. */
  private def committedEpochs(): Seq[Long] =
    if (!Files.exists(manifestDir)) Seq.empty
    else Files.list(manifestDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong).toSeq.sorted

  /** Per-partition high-water offsets from the latest commit manifest. */
  def highWater(): Map[Int, Long] = {
    val epochs = committedEpochs()
    if (epochs.isEmpty) Map.empty
    else {
      val last = manifestDir.resolve(s"${epochs.last}.commit")
      Files.readAllLines(last).asScala.filter(_.nonEmpty).map { line =>
        val Array(p, o) = line.split(","); p.toInt -> o.toLong
      }.toMap
    }
  }

  import TopicLog.StagedAppend

  /**
   * Produce a batch: route rows to partitions, assign monotonically
   * increasing offsets per partition, append parquet, commit manifest.
   *
   * Routing parity (reference MessageRoutingMode.java:39-55):
   *   keyed rows  → murmur3(key) % numPartitions  (key-hash routing)
   *   unkeyed     → caller pre-assigns `partition` (round-robin stand-in)
   *
   * `df` must carry envelope columns except topic/partition/offset, which
   * this method derives. Returns count appended. Appends are single-writer
   * per topic (the reference serializes per-partition adds the same way,
   * ManagedLedgerImpl.internalAsyncAddEntry:821).
   */
  def append(df: DataFrame): Long = {
    val staged = stageAppend(df)
    publishManifest(staged)
    staged.count
  }

  /** Phase 1: write data files + compute the manifest, WITHOUT publishing
    * — rows stay invisible to readers until [[publishManifest]]. */
  def stageAppend(df: DataFrame): StagedAppend = {
    val hw = highWater()
    val hwDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until numPartitions).map(p => org.apache.spark.sql.Row(p, hw.getOrElse(p, -1L))), 1),
      StructType(Seq(StructField("partition", IntegerType), StructField("base_offset", LongType))))

    val routed = (if (df.columns.contains(Envelope.Partition)) df
      else df.withColumn(Envelope.Partition,
        pmod(Murmur3Pulsar.pulsar_hash(col(Envelope.Key)), lit(numPartitions)).cast(IntegerType)))
      .withColumn(Envelope.Topic, lit(name.fqn))

    // Offset assignment: rank within the incoming batch per partition,
    // ordered by (publish_time, sequence_id) for determinism, added to the
    // committed high-water mark. Only the new batch is shuffled.
    val w = Window.partitionBy(Envelope.Partition)
      .orderBy(col(Envelope.PublishTime), col(Envelope.SequenceId))
    val withOffsets = routed
      .withColumn("_rn", row_number().over(w).cast(LongType))
      .join(broadcast(hwDf), Seq(Envelope.Partition))
      .withColumn(Envelope.Offset, col("base_offset") + col("_rn"))
      .drop("_rn", "base_offset")

    val epoch = committedEpochs().lastOption.getOrElse(-1L) + 1L
    val staged = withOffsets.persist()
    val n = staged.count()
    // data lands under _staging/<epoch>/ — underscore dirs are invisible
    // to Spark file listing, so neither batch readers nor streaming
    // subscribers can observe rows before publishManifest moves them
    staged.write.mode("append").partitionBy(Envelope.Partition)
      .parquet(s"$basePath/_staging/$epoch")

    // new high-water per partition
    val newHw = staged.groupBy(Envelope.Partition).agg(max(Envelope.Offset).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    staged.unpersist()
    val merged = (0 until numPartitions)
      .map(p => p -> math.max(hw.getOrElse(p, -1L), newHw.getOrElse(p, -1L)))
    StagedAppend(epoch, merged.map { case (p, o) => s"$p,$o" }.mkString("\n"), n)
  }

  /** Phase 2: publish — manifest write (the atomic commit point) then
    * move the staged files into the readable partition dirs. Streaming
    * subscribers list files only after the move, by which time the
    * manifest exists, so the read-committed gate passes them through
    * (never drops a committed row). A crash between manifest and moves is
    * healed by [[TopicLog.recoverStaging]]. Idempotent when the same
    * manifest is republished (txn recovery); a DIFFERENT manifest at the
    * same epoch means two writers raced — fail loudly rather than
    * silently dropping one commit (appends are single-writer per topic,
    * ManagedLedgerImpl.internalAsyncAddEntry:821). */
  def publishManifest(staged: StagedAppend): Unit = {
    Files.createDirectories(manifestDir)
    val target = manifestDir.resolve(staged.manifestPath)
    if (Files.exists(target)) {
      val existing = new String(Files.readAllBytes(target))
      require(existing == staged.manifestLines,
        s"manifest epoch ${staged.epoch} already committed with different " +
          s"content — concurrent writers detected on ${name.fqn}")
    } else {
      val tmp = manifestDir.resolve(s"${staged.epoch}.tmp")
      Files.write(tmp, staged.manifestLines.getBytes)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    }
    TopicLog.completeStagedMoves(basePath, staged.epoch)
  }

  /** Full-log batch read (committed data only — up to the manifest HW). */
  def read(): DataFrame = {
    val hw = highWater()
    if (hw.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Envelope.schema)
    else {
      val cond = hw.map { case (p, o) =>
        (col(Envelope.Partition) === p) && (col(Envelope.Offset) <= o)
      }.reduce(_ || _)
      spark.read.parquet(basePath).filter(cond)
    }
  }

  /**
   * Reader positioned at an offset (reference Reader.java:49 non-durable
   * scan): `offset >= from` within one partition.
   */
  def readFrom(partition: Int, fromOffset: Long): DataFrame =
    read().filter(col(Envelope.Partition) === partition &&
      col(Envelope.Offset) >= fromOffset)

  /**
   * Seek-by-timestamp (reference PersistentMessageFinder.java:63 binary
   * search over publish time): smallest offset per partition with
   * publish_time >= ts. Parquet min/max stats give the pruning the
   * reference gets from its ledger time index.
   */
  def seekByTime(ts: java.sql.Timestamp): DataFrame =
    read().filter(col(Envelope.PublishTime) >= lit(ts))
      .groupBy(col(Envelope.Partition))
      .agg(min(Envelope.Offset).as("seek_offset"))
}
