package graft.sources

import graft.log.TopicLog
import graft.model.Envelope

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * Topic → rotating text-file sink: one implementation covering the two
 * filesystem connectors in the reference:
 *
 *  - hdfs3 (`pulsar-io/hdfs3/.../HdfsAbstractSink.java:44`,
 *    `HdfsAbstractTextFileSink.java:38`, `HdfsSyncThread.java:33`):
 *    records are the VALUE bytes joined by a configurable separator
 *    char; records stay un-acked — bounded by `maxPendingRecords` —
 *    until a durable sync (`hsync` → ack);
 *  - alluxio (`pulsar-io/alluxio/.../AlluxioSink.java:67`): records
 *    accumulate in a tmp file; rotation fires when the file reaches
 *    `rotationRecords` records or `rotationIntervalMs` age; commit =
 *    close + rename out of `tmp/` into the target dir; records are
 *    acked only after the commit, failed + tmp deleted on error.
 *
 * Spark-first divergence (deliberate): the reference appends to one
 * live file per sink instance and acks at sync points — at-least-once,
 * and a crash duplicates the tail. Here each micro-batch lands as
 * rotated files named `prefix-p<partition>-o<first>-<last><ext>` from
 * the COMMITTED offset range they hold, written tmp-first, fsync'd,
 * then atomically renamed. Names are a pure function of content, so a
 * replayed micro-batch overwrites the same files byte-for-byte —
 * idempotent, effectively exactly-once. Rotation by record count keeps
 * file sizes bounded at 100 TB (no 2 GB single-file appends), and the
 * read-back path gets one task per rotated file.
 *
 * Tombstones (null value, compaction semantics) are written as an
 * empty record slot so offsets stay reconstructible; the reference
 * text sink would NPE on them (`HdfsAbstractTextFileSink.java:58`
 * `kv.getValue().toString()`).
 *
 * FILESYSTEM SCOPE: this sink writes through `java.nio` by DESIGN —
 * it is the LOCAL-mount connector (the reference's hdfs3/alluxio sinks
 * write through their own client libraries, not the broker's storage
 * layer; this one targets a locally-mounted directory the same way).
 * It deliberately does NOT ride [[graft.log.PathIO]]: the per-record
 * append + fsync + rename loop is a sink transport, not engine control
 * plane, and per-record `FileSystem` round-trips would be the wrong
 * shape for a remote scheme anyway — a DFS deployment writes parquet
 * through Spark's own committers instead. Sizing note: `readBack`'s
 * wall on a huge file census is a driver metadata floor linear in FILE
 * COUNT (SNAPSHOTS.md round-13 attribution) — scale `rotationRecords`
 * with throughput so the census stays bounded.
 */
object FileRotatingSink {

  /** Union of `HdfsSinkConfig.java:40` and `AlluxioSinkConfig` knobs
    * that survive the Spark mapping. `rotationIntervalMs = -1` disables
    * age-based rotation (alluxio's default). */
  final case class Config(directory: String,
                          filenamePrefix: String,
                          fileExtension: String = ".txt",
                          separator: Char = '\n',
                          rotationRecords: Long = 10000L,
                          rotationIntervalMs: Long = -1L,
                          maxPendingRecords: Int = Int.MaxValue) {
    require(filenamePrefix.nonEmpty, "filenamePrefix is required")
    require(rotationRecords >= 1, "rotationRecords must be >= 1")
    require(rotationIntervalMs == -1L || rotationIntervalMs > 0,
      "rotationIntervalMs must be -1 (disabled) or positive")
    require(maxPendingRecords >= 1, "maxPendingRecords must be >= 1")
    def fileName(partition: Int, first: Long, last: Long): String =
      s"$filenamePrefix-p$partition-o$first-$last$fileExtension"
  }

  /**
   * One topic-partition's writer; lives on an executor for the span of
   * its partition iterator. Not thread-safe (one Spark task owns it).
   * `clock` injectable so interval rotation is testable.
   */
  final class PartitionWriter(cfg: Config, partition: Int,
                              clock: () => Long = () => System.currentTimeMillis()) {
    private val dir = Paths.get(cfg.directory)
    private val tmpDir = dir.resolve("tmp")
    private var out: FileOutputStream = null
    private var tmpPath: Path = null
    private var firstOffset = -1L
    private var lastOffset = -1L
    private var records = 0L
    private var pendingSinceSync = 0
    private var openedAt = 0L
    private var committedFiles = List.empty[Path]
    /** Durable-sync count (hsync→ack events) — observable for specs. */
    var syncs: Int = 0

    private def openTmp(offset: Long): Unit = {
      Files.createDirectories(tmpDir): Unit
      tmpPath = tmpDir.resolve(
        s"${cfg.filenamePrefix}-p$partition-${java.util.UUID.randomUUID()}.tmp")
      out = new FileOutputStream(tmpPath.toFile)
      firstOffset = offset
      records = 0L
      pendingSinceSync = 0
      openedAt = clock()
    }

    def write(value: Array[Byte], offset: Long): Unit = {
      if (out == null) openTmp(offset)
      if (value != null) out.write(value)
      out.write(cfg.separator.toInt)
      lastOffset = offset
      records += 1
      pendingSinceSync += 1
      // hdfs3 ack path: pending records are capped; hitting the cap
      // forces a durable sync so they can be acked (HdfsSyncThread.hsync)
      if (pendingSinceSync >= cfg.maxPendingRecords) sync()
      if (shouldRotate()) rotate()
    }

    private def shouldRotate(): Boolean =
      records >= cfg.rotationRecords ||
        (cfg.rotationIntervalMs != -1L && clock() - openedAt >= cfg.rotationIntervalMs)

    private def sync(): Unit = {
      out.flush()
      out.getChannel.force(true)
      pendingSinceSync = 0
      syncs += 1
    }

    /** Close + fsync + atomic rename into the target dir (the alluxio
      * closeAndCommitTmpFile step); replays overwrite the same name. */
    def rotate(): Unit = if (out != null) {
      sync()
      out.close()
      val target = dir.resolve(cfg.fileName(partition, firstOffset, lastOffset))
      Files.move(tmpPath, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING): Unit
      committedFiles ::= target
      out = null
      tmpPath = null
    }

    /** Final rotate; returns every committed file, newest first. */
    def close(): Seq[Path] = { rotate(); committedFiles }

    /** Failure path (alluxio failRecords + deleteTmpFile): drop the
      * uncommitted tmp file; already-committed files stand. */
    def abort(): Unit = if (out != null) {
      out.close()
      Files.deleteIfExists(tmpPath): Unit
      out = null
      tmpPath = null
    }
  }

  /**
   * Stream the topic's committed rows into rotated files. Layout: one
   * writer per TOPIC partition, rows in offset order — `repartition`
   * on the partition column keeps each topic partition whole inside
   * one task; sorting by (partition, offset) makes each partition's
   * rows a contiguous ordered run, so the task walks runs and swaps
   * writers at partition boundaries. Executors write in parallel, the
   * driver never sees a row.
   */
  def topicToFileSink(topic: TopicLog, cfg: Config,
                      checkpoint: String): StreamingQuery =
    SinkHarness.start(topic, checkpoint) { committed =>
      committed
        .select(col(Envelope.Partition), col(Envelope.Offset), col(Envelope.Value))
        .repartition(col(Envelope.Partition))
        .sortWithinPartitions(col(Envelope.Partition), col(Envelope.Offset))
        .rdd.foreachPartition { rows =>
          var writer: PartitionWriter = null
          var current = Int.MinValue
          try {
            rows.foreach { row =>
              val p = row.getInt(0)
              if (p != current) {
                if (writer != null) writer.close(): Unit
                writer = new PartitionWriter(cfg, p)
                current = p
              }
              val v = if (row.isNullAt(2)) null else row.getString(2).getBytes(UTF_8)
              writer.write(v, row.getLong(1))
            }
            if (writer != null) writer.close(): Unit
          } catch {
            case t: Throwable =>
              if (writer != null) writer.abort()
              throw t
          }
        }
    }

  /**
   * Read committed files back as (partition, offset, value) — the
   * inverse mapping, usable as a Spark source over a sink'd directory.
   * One input row per rotated file (bounded by `rotationRecords`), so
   * parallelism = file count; all reconstruction is codegen'd
   * expressions (split/posexplode), no UDFs. Topic-log offsets are
   * dense per partition, so `first + pos` restores each record's
   * offset exactly; empty slots read back as empty strings (tombstone
   * payloads are not distinguishable from "" in a text file — same
   * loss as the reference text sink).
   */
  def readBack(spark: SparkSession, cfg: Config): DataFrame = {
    val ext = java.util.regex.Pattern.quote(cfg.fileExtension)
    val nameRe = s"-p(\\d+)-o(\\d+)-(\\d+)$ext$$"
    // split() takes a REGEX: quote the separator so '.', '|' etc. split
    // literally, then escape for the SQL string literal
    val sepRe = java.util.regex.Pattern.quote(cfg.separator.toString)
      .replace("\\", "\\\\").replace("'", "\\'")
    spark.read.format("binaryFile")
      .load(s"${cfg.directory}/${cfg.filenamePrefix}-*${cfg.fileExtension}")
      .select(
        regexp_extract(col("path"), nameRe, 1).cast("int").as("partition"),
        regexp_extract(col("path"), nameRe, 2).cast("long").as("first"),
        regexp_extract(col("path"), nameRe, 3).cast("long").as("last"),
        decode(col("content"), "UTF-8").as("text"))
      // every record ends with the separator → drop the trailing empty slot
      .select(col("partition"), col("first"), col("last"),
        expr(s"slice(split(text, '$sepRe'), 1, " +
          s"greatest(size(split(text, '$sepRe')) - 1, 0))")
          .as("slots"))
      .select(col("partition"), col("first"), col("last"),
        posexplode(col("slots")).as(Seq("pos", "value")))
      .select(col("partition"), (col("first") + col("pos")).as("offset"),
        col("value"))
  }
}
