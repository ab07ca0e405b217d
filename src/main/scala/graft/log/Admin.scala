package graft.log

import graft.model.Envelope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.{Path => HPath}

/**
 * Log-management jobs: retention trim, truncate, tiered-storage offload,
 * small-file coalescing, backlog quota — the reference's broker/admin
 * verbs over the parquet-backed topic log.
 *
 *  - retention (ManagedLedgerImpl.internalTrimLedgers:2596 /
 *    hasLedgerRetentionExpired:2698): delete whole files whose max
 *    publish_time is past retention — file-level, no row rewrite, exactly
 *    like dropping whole ledgers;
 *  - truncate (Topics.truncate): drop all data files, keep topic + cursors;
 *  - offload (LedgerOffloader.java:137/183): move cold files to a cold
 *    tier path; readers union hot + cold transparently;
 *  - coalesce: compact many small parquet files per partition (the
 *    ledger-rollover analog, SURVEY §4);
 *  - backlog quota (BacklogQuotaManager; broker.conf:177-180): measure
 *    un-acked backlog, enforce consumer_backlog_eviction by advancing the
 *    cursor.
 */
object Admin {

  private def dataFiles(log: TopicLog): Seq[HPath] = {
    // QUALIFIED paths throughout (PathIO.qualify): fileMax keys on
    // input_file_name()'s decoded-and-qualified URI, so a relative or
    // scheme-spelled-differently TopicLog root can't make every lookup
    // miss and retention/offload silently no-op forever
    val base = PathIO.qualify(log.name.path(log.root))
    log.manifestFiles() match {
      // file snapshot active (post-coalesce): the manifest, not the
      // directory, defines liveness — unreferenced files awaiting vacuum
      // must not be re-trimmed/offloaded/counted
      case Some(live) =>
        live.map(PathIO.child(base, _)).filter(PathIO.exists(_))
      case None =>
        if (!PathIO.exists(base)) Seq.empty
        else {
          // direct stagings park final-path files BEFORE any manifest
          // references them (TopicLog.stagingRecord) — in-flight writer
          // state the offset-only walk must skip, or retention/offload
          // would move/delete a transaction's staged rows
          val staged = log.stagingRecordFiles()
          TopicLog.walkAll(base)
            .filter(p => p.getName.endsWith(".parquet") && {
              val rel = PathIO.relativize(base, p)
              // any underscore-prefixed subtree is metadata/derived
              // (manifest, cold tier, compacted snapshots, txn markers)
              // — never touch it
              !rel.split('/').exists(_.startsWith("_")) &&
                !staged.contains(rel)
            })
            .map(PathIO.qualify(_))
        }
    }
  }

  /** Drop `victims` from the manifest snapshot (when active) BEFORE the
    * physical delete/move, so no committed manifest references a missing
    * file. */
  private def unreference(log: TopicLog, victims: Seq[HPath]): Unit = {
    val base = PathIO.qualify(log.name.path(log.root))
    log.dropFromSnapshot(victims.map(p => PathIO.relativize(base, p)))
  }

  /** Per-file max of `aggCol` in ONE distributed job (input_file_name
    * grouping) — the O(N-files) sequential-job trap is exactly what a
    * continuous 100 TB maintenance path cannot afford. */
  private def fileMax(log: TopicLog, files: Seq[HPath],
                      aggCol: String): Map[String, Any] = {
    if (files.isEmpty) return Map.empty
    log.spark.read.parquet(files.map(_.toString): _*)
      .groupBy(input_file_name().as("f"))
      .agg(max(aggCol).as("m"))
      .collect()
      .map(r => decodeFileUri(r.getString(0)) -> r.get(1)).toMap
  }

  /** input_file_name() is a URI (possibly percent-encoded); decode it
    * and re-qualify through [[PathIO.qualify]] so it keys identically
    * to [[dataFiles]]' qualified paths on ANY scheme — a silent
    * spelling mismatch here would no-op retention/offload forever. */
  private def decodeFileUri(raw: String): String =
    try PathIO.qualify(new HPath(java.net.URI.create(raw))).toString
    catch {
      case _: Throwable => PathIO.qualify(raw).toString
    }

  /**
   * Delete data files entirely older than `retentionMs` relative to
   * `nowMs`. Returns number of files removed. File-granular like ledger
   * trim: a file survives while any row is in retention.
   */
  def retentionTrim(log: TopicLog, nowMs: Long, retentionMs: Long): Int = {
    val cutoff = new java.sql.Timestamp(nowMs - retentionMs)
    val files = dataFiles(log)
    val maxByFile = fileMax(log, files, Envelope.PublishTime)
    val victims = files.filter { p =>
      maxByFile.get(p.toString) match {
        case Some(ts: java.sql.Timestamp) => ts.before(cutoff)
        case _ => false
      }
    }
    unreference(log, victims)
    victims.foreach(PathIO.deleteIfExists(_))
    victims.size
  }

  /** Janitor: bound manifest history across every topic AND ack log
    * under the root — one [[TopicLog.pruneManifestHistory]] per base,
    * with its txn-marker and staged-epoch skip rules. Run on the
    * [[Txn.vacuumAll]] cadence; without it `_manifest` listings (on
    * every read) pay O(all-time appends). Returns files deleted. */
  def pruneManifests(root: String, keepLast: Int = 16): Int = {
    // one marker parse for the whole sweep (Txn.vacuumAll's rule: a
    // per-base parse costs (T+S) full passes over `_txn`)
    val markers = Some(Txn.markerEpochs(root))
    Topics.list(root).map { t =>
      val base = t.path(root)
      val subs = PathIO.path(base, "_subs")
      val ackBases =
        if (!PathIO.exists(subs)) Seq.empty[String]
        else TopicLog.listDir(subs).filter(PathIO.isDirectory(_))
          .map(s => s"$base/_subs/${s.getName}/acks")
          .filter(b => PathIO.exists(PathIO.path(b)))
      (base +: ackBases)
        .map(b => TopicLog.pruneManifestHistory(b, root, keepLast, markers)).sum
    }.sum
  }

  /** Truncate: remove every data file (manifest/cursors untouched — the
    * reference keeps the topic and subscriptions alive). */
  def truncate(log: TopicLog): Int = {
    val victims = dataFiles(log)
    unreference(log, victims)
    victims.foreach(PathIO.deleteIfExists(_))
    victims.size
  }

  /**
   * Partition-count expansion (reference `pulsar-admin topics
   * update-partitions`; PersistentTopics.updatePartitionedTopic — the
   * count may only grow). Existing rows keep their partition, offsets,
   * and order; rows appended through the returned handle key-hash route
   * over the new count, with new partitions starting at offset 0 (their
   * high-water defaults in at −1 until their first manifest line).
   * Per-key order across the expansion boundary is NOT preserved — a
   * key's new slot differs from its old one — exactly the reference's
   * documented caveat for updating partitions on keyed topics.
   */
  def updatePartitions(log: TopicLog, newCount: Int): TopicLog = {
    require(newCount > log.numPartitions,
      s"partition count may only grow (reference rejects shrink): " +
        s"${log.numPartitions} -> $newCount")
    new TopicLog(log.spark, log.root, log.name, newCount)
  }

  /**
   * Offload files whose rows are all at/below `beforeOffset` to the cold
   * tier directory `<topic>/_cold/`, preserving the partition subpath.
   * Returns files offloaded. [[readTiered]] unions hot + cold.
   *
   * Crash safety differs by manifest mode:
   *  - SNAPSHOT mode: COPY to cold first, THEN unreference — the
   *    committed rows exist in at least one visible tier at every
   *    instant. Crash after copy, before unreference: the cold copy is
   *    excluded by [[readTiered]] (its relative path is still live in
   *    the hot snapshot — no duplicates) and a re-run completes
   *    (REPLACE_EXISTING). Crash after unreference: the hot original is
   *    unreferenced garbage [[TopicLog.vacuum]] collects; the cold copy
   *    serves reads. The earlier unreference-then-MOVE order had a
   *    window where a crash left the rows in NEITHER tier and vacuum
   *    then deleted them permanently.
   *  - offset-only mode: one ATOMIC_MOVE per file is already
   *    all-or-nothing per file (the directory listing is the snapshot,
   *    so copy-first would double-read).
   */
  def offload(log: TopicLog, beforeOffset: Long): Int = {
    val base = PathIO.qualify(log.name.path(log.root))
    val files = dataFiles(log)
    val maxByFile = fileMax(log, files, Envelope.Offset)
    val moved = files.filter { p =>
      maxByFile.get(p.toString) match {
        case Some(o: java.lang.Long) => o <= beforeOffset
        case _ => false
      }
    }
    val snapshotMode = log.manifestFiles().isDefined
    if (snapshotMode) {
      moved.foreach { p =>
        val rel = PathIO.relativize(base, p)
        val target = PathIO.path(PathIO.child(base, "_cold").toString, rel)
        PathIO.mkdirs(target.getParent)
        PathIO.copy(p, target)
      }
      unreference(log, moved)
      // hot originals stay until TopicLog.vacuum() — in-flight readers
      // planned against the previous snapshot still resolve them
    } else {
      moved.foreach { p =>
        val rel = PathIO.relativize(base, p)
        val target = PathIO.path(PathIO.child(base, "_cold").toString, rel)
        PathIO.mkdirs(target.getParent)
        PathIO.move(p, target)
      }
    }
    moved.size
  }

  /** Transparent hot+cold read (reference readOffloaded). Cold files
    * whose relative path is STILL referenced by the hot snapshot are
    * excluded — they are half-offloaded copies (crash between copy and
    * unreference) whose rows the hot tier already serves. */
  def readTiered(log: TopicLog): DataFrame = {
    val spark = log.spark
    val base = log.name.path(log.root)
    val cold = PathIO.path(base, "_cold")
    val hot = log.read()
    if (!PathIO.exists(cold)) hot
    else {
      val live = log.manifestFiles().map(_.toSet).getOrElse(Set.empty[String])
      val visible = TopicLog.walkAll(cold)
        .filter(_.getName.endsWith(".parquet"))
        .filterNot(p => live.contains(PathIO.relativize(cold, p)))
      if (visible.isEmpty) hot
      else {
        // cold files keep their hive partition dirs under _cold/
        val coldDf = spark.read
          .option("basePath", cold.toString)
          .parquet(visible.map(_.toString): _*)
        hot.unionByName(coldDf, allowMissingColumns = true)
      }
    }
  }

  /**
   * Coalesce small files: rewrite each log partition's files into
   * `filesPerPartition` (the ledger-rollover/compaction-of-segments
   * analog). Data is unchanged; this is the scan-efficiency job a 100 TB
   * log needs continuously.
   *
   * Crash-safe and cache-free: the committed snapshot streams once from
   * [[TopicLog.read]] into `_staging/` and becomes visible at a single
   * atomic manifest commit ([[TopicLog.replaceDataFiles]]); the replaced
   * files stay on disk (unreferenced) until [[TopicLog.vacuum]], so
   * batch readers never observe a gap. A running FILE-SOURCE subscriber
   * will list the rewritten files as new and redeliver rows at or below
   * its cursor — the documented at-least-once envelope; effectively-once
   * consumers dedupe via the (partition, offset) cursor gate.
   */
  def coalesceFiles(log: TopicLog, filesPerPartition: Int = 1): Unit =
    // numPartitions × filesPerPartition target cells keyed on
    // (partition, offset-salt): each log partition's rows spread over
    // ≤ filesPerPartition writer tasks, and the rewrite runs with
    // partition-count parallelism. The earlier repartition(
    // filesPerPartition, partition) shape hashed EVERY row into
    // `filesPerPartition` total Spark partitions — at the default 1,
    // the whole topic rewrote through a single task, the exact
    // one-reducer funnel a 100 TB maintenance job cannot contain.
    log.replaceDataFiles(
      log.read().repartition(log.numPartitions * filesPerPartition,
        col(Envelope.Partition),
        pmod(col(Envelope.Offset), lit(filesPerPartition))))

  /**
   * Topic stats (reference `Topics.getStats`,
   * pulsar-client-admin-api/.../Topics.java; DTO
   * pulsar-common/.../policies/data/TopicStats.java): per-partition
   * storage counters joined with per-subscription cursor state — the
   * observability verbs an operator reads daily (msg counts, storage
   * size, average message size, per-subscription backlog and
   * mark-delete position).
   *
   * `subs` maps subscription name → its ack table (partition, offset),
   * the same shape [[graft.streaming.AckState]] maintains. Returns one
   * row per (subscription, partition):
   * (subscription, partition, msg_count, storage_bytes, avg_msg_size_r,
   * head_offset, producers, mark_delete, backlog), where storage_bytes
   * counts value+key payload octets (the parquet-log analog of ledger
   * storageSize), mark_delete is the highest offset with every log
   * offset at/below it acked (−1 if the first message is unacked), and
   * backlog counts unacked messages.
   *
   * Scale: storage stats are one partial-agg shuffle over the log;
   * backlog is a linear anti-join per subscription; mark-delete avoids
   * any per-partition sort — it is derived as "highest acked offset
   * below the minimum unacked offset", two linear aggregates, so a
   * billion-entry partition never funnels through one reducer.
   */
  /** The storage-size definition every stats verb shares: payload
    * octets of value + key (NULL-safe). Change it HERE only, or
    * topicStats / topicRates / the streaming stats twin disagree. */
  def payloadOctets: org.apache.spark.sql.Column =
    coalesce(octet_length(col(Envelope.Value)), lit(0)) +
      coalesce(octet_length(col(Envelope.Key)), lit(0))

  /** The one live [[topicStats]] backlog cache per session (weak keys:
    * a stopped session's entry vanishes with it). See the persist
    * lifecycle note inside [[topicStats]]. */
  private val lastStatsCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
        java.lang.ref.WeakReference[DataFrame]]())

  def topicStats(log: DataFrame, subs: Map[String, DataFrame]): DataFrame = {
    require(subs.nonEmpty,
      "topicStats needs at least one subscription (rows are per " +
        "(subscription, partition)); use topicInternalStats for storage-only stats")
    val spark = log.sparkSession
    import spark.implicits._
    val offsets = log.select(col(Envelope.Partition).as("partition"),
      col(Envelope.Offset).as("offset"))
    val store = log.groupBy(col(Envelope.Partition).as("partition")).agg(
      count(lit(1)).cast("bigint").as("msg_count"),
      sum(payloadOctets).cast("bigint").as("storage_bytes"),
      max(Envelope.Offset).as("head_offset"),
      countDistinct(Envelope.ProducerName).cast("bigint").as("producers"))
    val ackU = subs.map { case (name, a) =>
      a.select(col("partition"), col("offset")).distinct()
        .withColumn("subscription", lit(name))
    }.reduce(_.unionByName(_))
    val subNames = subs.keys.toSeq.sorted.toDF("subscription")

    // SHUFFLE_HASH, not sort-merge: the join rows are three numeric
    // columns that compress to a few bytes each, so AQE's size-based
    // partition coalescing hands a sort-merge join huge multi-million-row
    // sort tasks (measured: three ~25 s tasks dominating the 100× probe);
    // hashing the ack side per partition skips both sorts — same shuffle,
    // no sort barrier. The ack side still SHUFFLES (never broadcasts):
    // at real ack volumes it is the same order as the log itself.
    val unacked = offsets.crossJoin(broadcast(subNames))
      .join(ackU.hint("shuffle_hash"),
        Seq("subscription", "partition", "offset"), "left_anti")
    // persist the (subscription, partition)-grained aggregate: it is
    // referenced twice (min_unacked feeds the mark-delete filter AND the
    // final stats join), and without materialization the plan evaluates
    // the full offsets×subs anti-join subtree once per reference —
    // measured 2× the probe's dominant cost at 100× log size. The
    // cached table is |subs|×|partitions| rows (bytes, not data-scale).
    // Lifecycle: the session's PREVIOUS topicStats cache is released
    // here, bounding the cache-manager footprint at one entry per
    // session instead of one per call (persist entries are never
    // GC-collected; a per-invocation leak would accumulate across bench
    // reps / a stats-polling loop). Unpersisting the previous handle is
    // always safe — a concurrent reader of it merely recomputes.
    val backlogRaw = unacked.groupBy("subscription", "partition")
      .agg(count(lit(1)).cast("bigint").as("backlog"),
        min("offset").as("min_unacked"))
    // Deterministic reuse across calls (round 15 — the bimodal-wall
    // fix): consecutive topicStats calls over the same log and subs
    // build PLAN-IDENTICAL backlog aggregates, and the old
    // unpersist-then-re-persist flow left reuse to a RACE between the
    // CacheManager's same-plan dedup and the previous handle's async
    // unpersist — measured as a 0.4 s / 1.2 s bimodal wall (task-time
    // 0.1 s vs 1.2 s) on the stats bench rows. Reuse the live handle
    // outright when the plan AND the concrete input file set match; the
    // file-set guard keeps a GROWING topic's poller correct (new files
    // → different inputFiles → recompute), which plan equality alone
    // would not. INVARIANT the name-only guard leans on: TopicLog and
    // AckLog writers only ever ADD uniquely-named part files (offset- or
    // UUID-stamped) and janitor verbs DELETE whole files — no writer in
    // this engine overwrites an existing data file IN PLACE under the
    // same name. A future fixed-name writer would defeat this guard
    // silently (same names, changed bytes → stale persisted backlog
    // served); if one ever appears, extend the guard with per-file
    // length+mtime from listStatus rather than names alone.
    val prevLive = Option(lastStatsCache.get(spark))
      .flatMap(r => Option(r.get))
    val backlog = prevLive match {
      case Some(prev) if prev.queryExecution.analyzed
            .sameResult(backlogRaw.queryExecution.analyzed) &&
          prev.inputFiles.sorted.sameElements(backlogRaw.inputFiles.sorted) =>
        prev
      case other =>
        val b = backlogRaw
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // the value is a WeakReference so it cannot pin its own key (a
        // DataFrame strongly references its SparkSession; a strong
        // value would defeat the weak keys and leak one session + cache
        // handle per stopped session)
        lastStatsCache.put(spark, new java.lang.ref.WeakReference(b)): Unit
        // release the superseded entry — bounds the cache-manager
        // footprint at one entry per session; a concurrent reader of
        // the old handle merely recomputes
        other.foreach(prev =>
          try { prev.unpersist(false); () } catch { case _: Throwable => () })
        b
    }
    // mark-delete = highest acked offset below the first gap; every log
    // offset below min_unacked is acked by construction, so no sort
    // backlog/md sides are (subs × partitions) rows — bounded by
    // CONFIGURATION (subscription count × partition count), not data —
    // so they broadcast correctly at any scale; kept explicit so a
    // future refactor away from the local relation can't silently fall
    // back to a sort-merge join
    val md = ackU
      .join(broadcast(backlog.select("subscription", "partition", "min_unacked")),
        Seq("subscription", "partition"), "left_outer")
      .filter(col("min_unacked").isNull || col("offset") < col("min_unacked"))
      .groupBy("subscription", "partition")
      .agg(max("offset").as("mark_delete"))

    store.crossJoin(broadcast(subNames))
      .join(broadcast(backlog.drop("min_unacked")),
        Seq("subscription", "partition"), "left_outer")
      .join(broadcast(md), Seq("subscription", "partition"), "left_outer")
      .select(col("subscription"), col("partition"), col("msg_count"),
        col("storage_bytes"),
        round(col("storage_bytes").cast("double") / col("msg_count"), 6)
          .as("avg_msg_size_r"),
        col("head_offset"), col("producers"),
        coalesce(col("mark_delete"), lit(-1L)).as("mark_delete"),
        coalesce(col("backlog"), lit(0L)).as("backlog"))
  }

  /**
   * Throughput counters over time (the rate surface of TopicStats:
   * msgRateIn / msgThroughputIn are windowed derivatives of exactly
   * these counts): messages and payload octets per partition per
   * `bucket` of publish time. One partial-agg shuffle keyed
   * (partition, window) — the shape a live dashboard reads at any
   * scale. Divide by the bucket length for the rate.
   */
  def topicRates(log: DataFrame, bucket: String = "1 hour"): DataFrame =
    log.groupBy(col(Envelope.Partition).as("partition"),
        window(col(Envelope.PublishTime), bucket).as("w"))
      .agg(count(lit(1)).cast("bigint").as("msgs"),
        sum(payloadOctets).cast("bigint").as("bytes"))
      .select(col("partition"), col("w.start").as("bucket_start"),
        col("msgs"), col("bytes"))

  /**
   * Partitioned-topic rollup (reference `Topics.getPartitionedStats`
   * with perPartition=false: the DTO sums counters across partitions
   * while cursor positions stay per-partition): aggregates a
   * [[topicStats]] result to one row per subscription. Mark-delete is
   * NOT aggregated — a partitioned topic has one cursor per partition,
   * so the rollup reports backlog totals plus the partition count.
   */
  def partitionedStats(stats: DataFrame): DataFrame =
    stats.groupBy("subscription")
      .agg(count(lit(1)).cast("bigint").as("partitions"),
        sum("msg_count").cast("bigint").as("msg_count"),
        sum("storage_bytes").cast("bigint").as("storage_bytes"),
        sum("backlog").cast("bigint").as("backlog"))

  /**
   * Internal per-partition storage topology (reference
   * `Topics.getInternalStats`, DTO PersistentTopicInternalStats:
   * ledger list with entry counts and sizes). For the parquet-backed
   * log the "ledgers" are data files: one distributed job groups rows
   * by (partition, file) — never a per-file driver loop.
   */
  def topicInternalStats(log: TopicLog): DataFrame = {
    val files = dataFiles(log)
    if (files.isEmpty)
      return log.spark.createDataFrame(
        log.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("partition",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("n_files",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("entries",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("storage_bytes",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("head_offset",
            org.apache.spark.sql.types.LongType))))
    // file sizes ride the scan's own `_metadata.file_size` column (from
    // the listing Spark already performed) — no driver map keyed by
    // file, no per-file size RPC: the previous sizeByFile map was
    // O(files) driver memory plus one namenode call per file, exactly
    // the footprint a million-file topic's observability verb must not
    // have. Files are read individually (outside the hive root), so the
    // partition id comes from the `partition=<i>` path segment.
    log.spark.read.parquet(files.map(_.toString): _*)
      .groupBy(regexp_extract(col("_metadata.file_path"), "partition=(\\d+)", 1)
          .cast("int").as("partition"),
        col("_metadata.file_path").as("f"))
      .agg(count(lit(1)).as("entries"), max(Envelope.Offset).as("head"),
        // constant within the group — one value per file
        max(col("_metadata.file_size")).as("fsize"))
      .groupBy("partition")
      .agg(count(lit(1)).cast("bigint").as("n_files"),
        sum("entries").cast("bigint").as("entries"),
        sum("fsize").cast("bigint").as("storage_bytes"),
        max("head").as("head_offset"))
  }

  /**
   * Backlog quota check (BacklogQuotaManager.checkQuota): returns
   * per-partition backlog with quota verdict; `evictOldest` = the
   * consumer_backlog_eviction policy — computes the advanced cursor
   * (mark-delete) per partition that brings backlog within quota.
   */
  def backlogQuota(log: DataFrame, cursor: Map[Int, Long],
                   quotaMessages: Long): DataFrame = {
    val spark = log.sparkSession
    val cursorDf = spark.createDataFrame(cursor.toSeq)
      .toDF(Envelope.Partition, "cursor")
    log.join(broadcast(cursorDf), Seq(Envelope.Partition), "left")
      .filter(col("cursor").isNull || col(Envelope.Offset) > col("cursor"))
      .groupBy(Envelope.Partition)
      .agg(count(lit(1)).as("backlog"), max(Envelope.Offset).as("head"))
      .withColumn("over_quota", col("backlog") > quotaMessages)
      .withColumn("evict_to",
        when(col("over_quota"), col("head") - quotaMessages).otherwise(lit(null)))
  }
}
