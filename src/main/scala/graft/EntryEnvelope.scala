package graft

import graft.model.Envelope
import graft.operators.{AsOfJoin, Compaction, Dedup, Dispatch, Produce, Windows}
import graft.ext.{Graph, MinHash, TextOps, VectorOps}
import graft.functions.Murmur3Pulsar

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Envelope/topic operators: compaction, TableView, delayed/DLQ/redelivery, schema evolution, replication, time/count/session windows, serde roundtrips, sketches, chunking, crypto, quotas.
  *
  * One domain slice of the driver-contract registry: `queries` holds
  * this domain's `SparkEntry.queries` entries, `oracleSql` the
  * matching DuckDB oracles; [[SparkEntry]] concatenates the slices.
  * Split from the former single-file registry for hygiene — no
  * behavior change, same 161 keys. Shared helpers and oracle CTE
  * fragments live in [[EntryShared]]. */
private[graft] object EntryEnvelope {
  import EntryShared._

  /** §2.9 publish-order compaction: last value per key, tombstones out. */
  private def qCompactionPublish(s: SparkSession, dir: String): DataFrame =
    Compaction.publishOrder(env(s, dir))
      .select(col(Envelope.Key), col(Envelope.Value), col(Envelope.Offset))
      .orderBy(Envelope.Key)

  /** §2.9 event-time-order compaction. */
  private def qCompactionEventTime(s: SparkSession, dir: String): DataFrame =
    Compaction.eventTimeOrder(env(s, dir))
      .select(col(Envelope.Key), col(Envelope.Value), col(Envelope.Offset))
      .orderBy(Envelope.Key)

  /** §2.1 TableView: last metric value per event_type. */
  private def qTableView(s: SparkSession, dir: String): DataFrame =
    Compaction.tableView(env(s, dir), "event_type", "metric_value")
      .orderBy("event_type")

  /** §2.1 TableView on the STREAMING path: the envelope runs through
    * readStream → groupBy/max_by → complete-mode memory sink, with
    * `processAllAvailable()` as the TableView.refresh barrier
    * (TableViewImpl.refreshAsync:138); the converged table must equal
    * the batch `tableview` result row-for-row, so the whole streaming
    * machinery (source schema pin, state store, complete-mode sink)
    * sits under the same DuckDB oracle as the batch twin. */
  private def qTableViewStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s, graft.streaming.StreamOps.tableView(
        Envelope.fromEventsStream(s, dir),
        keyCol = "event_type", valueCol = "metric_value"))
      .filter(col("metric_value").isNotNull)
      .select(col("event_type"), col("metric_value"))
      .orderBy("event_type")

  /** The ext cleaning tier on the STREAMING path: documents stream
    * through the stateless quality filters, exact dedup runs as keyed
    * streaming state (dropDuplicates on (lang, content hash) — winner
    * ambiguity can't leak because every field the aggregate reads is
    * identical across duplicates), and the per-language corpus stats
    * aggregate in complete mode. The converged table sits under the
    * same DuckDB oracle shape as the batch cleaning queries.
    *
    * PRODUCTION CAVEAT: dropDuplicates without a watermark keeps its
    * dedup state forever — fine for this bounded fixture harness, but
    * an unbounded deployment must add event-time + `withWatermark` and
    * use `dropDuplicatesWithinWatermark` so the state store can evict
    * (the same retention decision every streaming dedup makes). */
  private def qQualityFilterStream(s: SparkSession, dir: String): DataFrame = {
    val stream = Envelope.streamTable(s, dir, "documents")
    val filtered = TextOps.withQualityScore(stream)
      .filter(col("n_tokens") >= 10 && col("mean_word_len").between(2.0, 12.0))
      .select(col("lang"), md5(col("text")).as("content_hash"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("toks"))
      .dropDuplicates("lang", "content_hash")
    val agg = filtered.groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("toks").cast("bigint").as("total_tokens"))
    runStreamToLocal(s, agg).orderBy("lang")
  }

  /** §2.6/§2.11 delayed delivery on the STREAMING path: the dispatch
    * gate (deliver_at due or absent) runs as a stateless filter over
    * readStream, append-mode — the per-microbatch form of the broker's
    * DelayedDeliveryTracker check at dispatch time. Must emit exactly
    * the batch `delayed_due` dispatchable set under the same oracle.
    * (The batch twin additionally proves the BUCKETED INDEX path with
    * partition pruning; the index is a batch artifact, so the streaming
    * gate is the filter itself.) */
  private def qDelayedDueStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s, Envelope.fromEventsStream(s, dir)
        .filter(col(Envelope.DeliverAt).isNull ||
          col(Envelope.DeliverAt) <=
            lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
        .select(col(Envelope.Offset), col(Envelope.Partition)),
      mode = "append")
      .orderBy(Envelope.Offset)

  /** §2.10 DLQ routing on the STREAMING path: the redelivery-count
    * routing decision (DLQ at >= maxRedeliverCount, else RETRY with
    * backoff) applied per microbatch over readStream, aggregated in
    * complete mode — converges to the batch `dlq_route` counts under
    * the same oracle. */
  private def qDlqRouteStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s,
      Dispatch.dlqRoute(Envelope.fromEventsStream(s, dir), "sub1", 3)
        .groupBy("route_topic").agg(count(lit(1)).cast("bigint").as("n")))
      .orderBy("route_topic")

  /** §2.10 unacked-timeout redelivery (reference UnAckedMessageTracker +
    * NegativeAcksTracker/RedeliveryBackoff): delivered-but-unacked
    * messages past the ack timeout re-enter with `redelivery_count+1`
    * and an exponential-backoff `deliver_at`. Delivery/ack state is
    * derived deterministically from the envelope (delivered = even
    * offsets at publish_time, acked = every 4th), so the oracle can
    * replay the exact backoff schedule: redeliver_at =
    * now + base·2^(old_count). */
  private def redeliveryNow = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")

  private def qRedeliverySet(s: SparkSession, dir: String,
                             log: DataFrame): DataFrame = {
    val batchEnv = env(s, dir)
    val delivered = batchEnv.filter(col(Envelope.Offset) % 2 === 0)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"),
        col(Envelope.PublishTime).as("delivered_at"))
    val acks = batchEnv.filter(col(Envelope.Offset) % 4 === 0)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))
    graft.streaming.AckState.redeliverOnTimeout(log, delivered, acks,
        redeliveryNow, ackTimeoutMs = 3600000L, backoffBaseMs = 60000L)
      .select(col(Envelope.Offset), col(Envelope.Partition),
        col(Envelope.RedeliveryCnt),
        date_format(col(Envelope.DeliverAt), "yyyy-MM-dd HH:mm:ss")
          .as("redeliver_at"))
  }

  private def qRedelivery(s: SparkSession, dir: String): DataFrame =
    qRedeliverySet(s, dir, env(s, dir)).orderBy(Envelope.Offset)

  /** [[qRedelivery]] on the STREAMING path (VERDICT r8 #4): the log side
    * is the live stream; delivered/ack state joins in stream-static
    * (inner + the anti-join folded into the static side), the
    * count-bump and backoff computation run stateless per microbatch,
    * append mode — the redelivered set and its backoff schedule must
    * hash-match the same DuckDB replay as the batch twin. */
  private def qRedeliveryStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s,
      qRedeliverySet(s, dir, Envelope.fromEventsStream(s, dir)),
      mode = "append")
      .orderBy(Envelope.Offset)

  /** §1.1/§7.4 AUTO_CONSUME heterogeneous-version decode in ONE scan
    * (reference Schema.AUTO_CONSUME → GenericRecord; VERDICT r8 #5): the
    * topic carries two LIVE schema versions — v1 `{"uid": …}` and v2
    * `{"user": …, "score": …}`, assigned by offset parity — decoded by
    * [[graft.model.SchemaRegistry.decodeVersioned]] (per-row from_json
    * dispatch on schema_version, reshaped onto the widest struct), then
    * split back into per-version frames carrying only their OWN fields
    * and re-merged through [[graft.model.SchemaRegistry.unionRead]]
    * (unionByName + null-fill — the AUTO_CONSUME read path). The field
    * names deliberately DIFFER across versions, so decoding any row with
    * the wrong version's schema nulls the wrong columns and breaks the
    * hash — the oracle replays both versions' payload formulas. */
  private def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    // NOT widened (avro/proto are): measured — the versioned decode is
    // cheap per row, wall stayed 1.16 s while task-time grew 8×
    val base = env(s, dir)
      .withColumn(Envelope.SchemaVersion,
        (col(Envelope.Offset) % 2 + 1).cast("int"))
      .withColumn("payload",
        when(col(Envelope.SchemaVersion) === 1,
          concat(lit("{\"uid\":\""), col(Envelope.Key), lit("\"}")))
          .otherwise(concat(lit("{\"user\":\""), col(Envelope.Key),
            lit("\",\"score\":"), col("metric_value").cast("string"),
            lit("}"))))
    val v1 = StructType(Seq(StructField("uid", StringType)))
    val v2 = StructType(Seq(StructField("user", StringType),
      StructField("score", DoubleType)))
    val decoded = graft.model.SchemaRegistry.decodeVersioned(
      base, "payload", Map(1 -> v1, 2 -> v2))
    val frames = Seq(
      decoded.filter(col(Envelope.SchemaVersion) === 1)
        .select(col(Envelope.Offset), col(Envelope.SchemaVersion),
          col("decoded.uid").as("uid")),
      decoded.filter(col(Envelope.SchemaVersion) === 2)
        .select(col(Envelope.Offset), col(Envelope.SchemaVersion),
          col("decoded.user").as("user_name"),
          round(col("decoded.score"), 6).as("score_r")))
    graft.model.SchemaRegistry.unionRead(frames)
      .orderBy(Envelope.Offset)
  }

  /** §2.13 replicated-subscription cursor travel (reference
    * ReplicatedSubscriptionsController.java:185-219; VERDICT r8 #6): the
    * replica carries the SAME rows under a DIFFERENT interleave (remote
    * offsets = block-reversed permutation of local order), a local
    * cursor acks ~60% of each partition, and the SubscriptionUpdate
    * translation must land on the replica's longest PREFIX-CLOSED
    * acked position — never past an unacked remote row (no loss),
    * re-delivering acked rows above the first gap (the reference's
    * at-least-once envelope). Output pins the consistent-cut snapshot
    * tops, the translated markDelete, and the resume backlog; the
    * oracle replays the identity join + running-min prefix in SQL. */
  private def qReplCursor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val local = env(s, dir)
    val remote = local.withColumn(Envelope.Offset,
      row_number().over(Window.partitionBy(Envelope.Partition)
        .orderBy(expr(s"${Envelope.Offset} div 10"),
          (col(Envelope.Offset) % 10).desc, col(Envelope.Offset)))
        .cast("long"))
    val cursor: Map[Int, Long] = local.groupBy(Envelope.Partition)
      .agg(expr(s"max(${Envelope.Offset}) * 3 div 5").as("md"))
      .collect() // bounded: one row per partition
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val snap = graft.streaming.ReplicatedCursors.snapshot(local, remote)
      .getOrElse(sys.error("snapshot not consistent — replica diverged"))
    val md = graft.streaming.ReplicatedCursors
      .translateCursor(local, remote, cursor)
    val resume = graft.streaming.ReplicatedCursors.applyCursor(remote, md)
      .groupBy(col(Envelope.Partition).as("partition"))
      .agg(count(lit(1)).cast("bigint").as("resume_n"))
    md.toSeq.map { case (p, o) =>
        (p, snap._1(p), snap._2(p), o)
      }.toDF("partition", "snap_local", "snap_remote", "mark_delete")
      .join(resume, Seq("partition"), "left")
      .withColumn("resume_n", coalesce(col("resume_n"), lit(0L)))
      .orderBy("partition")
  }

  /** §2.8 producer-sequence dedup (effectively-once produce). */
  private def qDedupSeq(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupBatch(env(s, dir))
      .select(col(Envelope.ProducerName), col(Envelope.SequenceId),
        col(Envelope.Offset))
      .orderBy(Envelope.ProducerName, Envelope.Offset)

  /** §2.8 dedup summary: kept/dropped counts per producer. */
  private def qDedupStats(s: SparkSession, dir: String): DataFrame = {
    val all = env(s, dir)
    val kept = Dedup.dedupBatch(all)
    all.groupBy(Envelope.ProducerName).agg(count(lit(1)).cast("bigint").as("received"))
      .join(kept.groupBy(Envelope.ProducerName)
        .agg(count(lit(1)).cast("bigint").as("kept")), Seq(Envelope.ProducerName))
      .withColumn("dropped", (col("received") - col("kept")).cast("bigint"))
      .orderBy(Envelope.ProducerName)
  }

  /** §2.11 delayed delivery via the bucketed due index (the at-scale
    * path): delayed rows land hive-partitioned by coarse due bucket; the
    * trigger reads only buckets ≤ bucket(T) — `PartitionFilters` prune
    * the scan to O(due data), never O(backlog) — plus the row-level
    * residual `deliver_at <= T`. Undelayed rows dispatch immediately and
    * never enter the index. Oracle unchanged: the union equals the flat
    * `deliver_at IS NULL OR deliver_at <= T` predicate. */
  private def qDelayedDue(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val idx = Fixtures.dir(s, dir, "due-idx") { root =>
      operators.DelayedBuckets.buildIndex(e, root)
    }
    val due = operators.DelayedBuckets.dueAt(s, idx,
      java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    e.filter(col(Envelope.DeliverAt).isNull)
      .select(col(Envelope.Offset), col(Envelope.Partition))
      .unionByName(due.select(col(Envelope.Offset), col(Envelope.Partition)))
      .orderBy(Envelope.Offset)
  }

  /** §2.3 TTL expiry: survivors per event_type with ttl = 7 days. The
    * "now" watermark (max publish time) is a 1-row aggregate broadcast
    * into the plan — one job, no driver-side `agg().head` pre-pass. */
  private def qTtl(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val nowDf = e.agg(max(col(Envelope.PublishTime)).as("_now"))
    Dispatch.applyTtl(e.crossJoin(broadcast(nowDf)), col("_now"), 7L * 24 * 3600)
      .groupBy("event_type").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("event_type")
  }

  /** §2.1 seek-by-timestamp: first offset per partition at/after T. */
  private def qSeekByTime(s: SparkSession, dir: String): DataFrame =
    env(s, dir).filter(col(Envelope.PublishTime) >=
        lit("2024-01-15 00:00:00").cast("timestamp"))
      .groupBy(col(Envelope.Partition))
      .agg(min(Envelope.Offset).as("seek_offset"))
      .orderBy(Envelope.Partition)

  /** §2.6 last message id per partition. */
  private def qLastIds(s: SparkSession, dir: String): DataFrame =
    Dispatch.lastMessageIds(env(s, dir)).orderBy(Envelope.Partition)

  /** §2.6 peek first 10 messages per partition. */
  private def qPeek(s: SparkSession, dir: String): DataFrame =
    Dispatch.peek(env(s, dir), 10)
      .select(col(Envelope.Partition), col(Envelope.Offset), col(Envelope.Key))
      .orderBy(Envelope.Partition, Envelope.Offset)

  /** §2.3/2.6 examine message: the 5th from earliest and 3rd from latest
    * per partition, unioned with a direction tag. Deliberately TWO
    * pruned scans, not one combined pass: each side keeps its
    * WindowGroupLimit (top-n bounded map-side, shuffle ≈ n rows per
    * partition), which a single scan with an OR over two ranks cannot —
    * Spark would shuffle the whole log. Gate-asserted in
    * PlanQualitySpec. */
  private def qExamine(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    Dispatch.examineMessage(e, "earliest", 5)
      .select(lit("earliest").as("from_pos"), col(Envelope.Partition),
        col(Envelope.Offset), col(Envelope.Key))
      .unionByName(Dispatch.examineMessage(e, "latest", 3)
        .select(lit("latest").as("from_pos"), col(Envelope.Partition),
          col(Envelope.Offset), col(Envelope.Key)))
      .orderBy("from_pos", Envelope.Partition)
  }

  /** §2.10 DLQ/retry routing after maxRedeliverCount = 3. */
  private def qDlqRoute(s: SparkSession, dir: String): DataFrame =
    Dispatch.dlqRoute(env(s, dir), "sub1", 3)
      .groupBy("route_topic").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("route_topic")

  /** §2.13 replication copy filter (no loops). */
  private def qReplication(s: SparkSession, dir: String): DataFrame =
    Dispatch.replicateTo(env(s, dir), "cluster-0", "cluster-1")
      .groupBy(Envelope.ReplicatedFrom)
      .agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy(Envelope.ReplicatedFrom)

  /** §2.13 replication on the STREAMING path — the production shape:
    * the reference's replicator IS a continuous copy job
    * (PersistentReplicator consumes the local topic and re-publishes),
    * so the loop/cycle filter must hold per microbatch. Converges to
    * the batch `replication_filter` counts under the same oracle. */
  private def qReplicationStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s,
      Dispatch.replicateTo(Envelope.fromEventsStream(s, dir),
          "cluster-0", "cluster-1")
        .groupBy(Envelope.ReplicatedFrom)
        .agg(count(lit(1)).cast("bigint").as("n")))
      .orderBy(Envelope.ReplicatedFrom)

  /** §2.5 tumbling 1h event-time window per event_type. */
  private def qWindowTumbling(s: SparkSession, dir: String): DataFrame =
    Windows.tumbling(env(s, dir), Envelope.EventTime, "1 hour",
      Seq(col("event_type")),
      Seq(count(lit(1)).cast("bigint").as("n"),
        sum(dec(col("metric_value"))).cast("double").as("sum_value")))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour", "event_type")

  /** §2.5 tumbling windows on the STREAMING path: the same windowed
    * aggregation as [[qWindowTumbling]] run as an actual streaming
    * query (complete-mode memory sink, processAllAvailable barrier) —
    * stateful streaming window aggregation must converge to the batch
    * result row-for-row under the same oracle. */
  private def qWindowTumblingStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s, Windows.tumbling(Envelope.fromEventsStream(s, dir),
        Envelope.EventTime, "1 hour",
        Seq(col("event_type")),
        Seq(count(lit(1)).cast("bigint").as("n"),
          sum(dec(col("metric_value"))).cast("double").as("sum_value"))))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour", "event_type")

  /** §2.5 sliding 1h/30m window per event_type. */
  private def qWindowSliding(s: SparkSession, dir: String): DataFrame =
    Windows.sliding(env(s, dir), Envelope.EventTime, "1 hour", "30 minutes",
      Seq(col("event_type")),
      Seq(count(lit(1)).cast("bigint").as("n")))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"))
      .orderBy("wstart", "event_type")

  /** §2.5/§7.4 count-based tumbling windows (20 events per user). */
  private def qWindowCount(s: SparkSession, dir: String): DataFrame =
    Windows.countTumblingBatch(env(s, dir), Envelope.Key, Envelope.Offset, 20,
      Seq(sum(dec(col("metric_value"))).cast("double").as("sum_value"),
        max(Envelope.Offset).as("last_offset")))
      .select(col(Envelope.Key), col("window_id"), col("sum_value"), col("last_offset"))
      .orderBy(Envelope.Key, "window_id")

  /** §2.5/§7.4 sliding count windows: every 10th event per user fires a
    * window over the last 25 events (decimal-exact sum). */
  private def qWindowCountSliding(s: SparkSession, dir: String): DataFrame =
    Windows.countSlidingBatch(
        env(s, dir).withColumn("mv", dec(col("metric_value"))),
        Envelope.Key, Envelope.Offset, length = 25, slide = 10, valueCol = "mv")
      .select(col(Envelope.Key), col("trigger_id"),
        col("w_sum").cast("double").as("w_sum"),
        col("w_max").cast("double").as("w_max"))
      .orderBy(Envelope.Key, "trigger_id")

  /** §2.5 session windows (30-minute inactivity gap) per user — Spark
    * session_window vs the oracle's gaps-and-islands reconstruction. */
  private def qSessionWindows(s: SparkSession, dir: String): DataFrame =
    Windows.session(env(s, dir), Envelope.EventTime, "30 minutes",
        keys = Seq(col(Envelope.Key)), aggs = Seq(count(lit(1)).as("n")))
      .groupBy(Envelope.Key)
      .agg(count(lit(1)).cast("bigint").as("n_sessions"),
        sum("n").cast("bigint").as("n_events"))
      .orderBy(col(Envelope.Key))

  /** §2.5 session windows on the STREAMING path: the stateful
    * session_window aggregation runs through readStream →
    * complete-mode memory sink and must converge to the same
    * per-session rows the batch islands oracle derives — gating the
    * streaming session-state machinery (merge-on-gap, state store)
    * under the DuckDB oracle. */
  private def qSessionWindowsStream(s: SparkSession, dir: String): DataFrame = {
    // 10× growth attribution (r9): 5.8× for 10× data, the one stream
    // twin above the 2-3× band. The fixture's mean per-user inter-event
    // gap (~4 h) dwarfs the 30-min session gap, so sessions ≈ singleton
    // events and complete mode re-emits ~n sessions EVERY trigger —
    // cost is (state ≈ n) × triggers by semantics, not a plan defect.
    // SPARK-36576 local pre-merge was A/B'd and does NOT help here
    // (14.8 s vs 14.4 s warm at 10×): singleton sessions give the local
    // merge nothing to collapse. A production deployment bounds this
    // with a watermark + append (sessions emit once, state evicts); the
    // oracle twin needs complete mode because the fixture's part files
    // are not time-ordered, so any watermark drops legitimate rows.
    runStreamToLocal(s,
      Windows.session(Envelope.fromEventsStream(s, dir), Envelope.EventTime,
        "30 minutes", keys = Seq(col(Envelope.Key)),
        aggs = Seq(count(lit(1)).cast("bigint").as("n"))))
      .select(col(Envelope.Key),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n"))
      .orderBy(Envelope.Key, "session_start")
  }

  /** §2.5 session windows, BOUNDED-STATE streaming configuration —
    * watermark + APPEND mode, the production deployment shape (the
    * complete-mode twin above is the unordered-source fallback whose
    * state grows with n × triggers by semantics). The fixture is the
    * same events data written as TIME-ORDERED range-bucket files
    * (bucket i's max event_time ≤ bucket i+1's min, mtimes increasing,
    * so the file source replays them in event-time order and the
    * watermark never drops a legitimate row), plus one far-future
    * sentinel row whose final batch advances the watermark past every
    * real session's end — each session emits EXACTLY ONCE and its state
    * evicts (Spark's no-data microbatch flushes the tail). Trigger
    * count is constant in data size (fixed bucket count), so at 10×/
    * 100× the wall tracks data volume, not trigger overhead. */
  private def qSessionWindowsWatermark(s: SparkSession, dir: String): DataFrame = {
    val nb = 8
    val root = Fixtures.dir(s, dir, "q-sesswm") { r =>
      val ev = env(s, dir).select(col(Envelope.Key), col(Envelope.EventTime))
      val b = ev.agg(min(Envelope.EventTime), max(Envelope.EventTime)).head()
      val lo = b.getTimestamp(0).getTime
      val hi = b.getTimestamp(1).getTime
      val span = math.max(1L, hi - lo + 1)
      // persist: the loop below writes one slice per bucket — without
      // the cache each filter re-scans and re-buckets the WHOLE events
      // frame (nb+1 full passes; at the stress tier's 100× that is the
      // dominant fixture-build cost)
      val bucketed = ev.withColumn("_b",
        least(lit(nb - 1), floor((unix_millis(col(Envelope.EventTime)) - lo)
          * nb / span)).cast("int"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sentinel = s.range(1).select(
        lit("__wm__").as(Envelope.Key),
        timestamp_millis(lit(hi + (150 * 60 * 1000L))).as(Envelope.EventTime),
        lit(nb).as("_b"))
      val base = System.currentTimeMillis() - (nb + 2) * 2000L
      try (0 to nb).foreach { i =>
        val part = if (i == nb) sentinel else bucketed.filter(col("_b") === i)
        // the file source replays oldest-mtime-first: the bucket order
        // IS the event-time order, pinned explicitly (a same-ms batch
        // of moves would otherwise tie)
        writeStreamSlice(part.drop("_b"), r, f"batch_$i%04d.parquet",
          base + i * 2000L)
      } finally { bucketed.unpersist(false): Unit }
    }
    // 3 range files per trigger: the watermark/state machinery still
    // cycles across multiple triggers (the semantics under test) without
    // paying 9 trigger setups — files within one trigger may interleave
    // freely because the watermark only advances BETWEEN triggers
    val schema = s.read.parquet(root).schema
    val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", 3)
      .option("pathGlobFilter", "*.parquet").parquet(root)
    runStreamToLocal(s,
      Windows.session(stream, Envelope.EventTime, "30 minutes",
        keys = Seq(col(Envelope.Key)),
        aggs = Seq(count(lit(1)).cast("bigint").as("n")),
        maxLag = Some("1 second")),
      mode = "append")
      .filter(col(Envelope.Key) =!= "__wm__")
      .select(col(Envelope.Key),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n"))
      .orderBy(Envelope.Key, "session_start")
  }

  /** §2.9 STRATEGIC compaction on the oracle surface (reference
    * StrategicTwoPhaseCompactor with a pluggable strategy): keep the
    * MAX-metric message per key (offset tie-break), tombstones (null
    * value) still deleting the key — the custom total-order strategy
    * the spec suite exercises, now hash-checked against a DuckDB
    * ROW_NUMBER replay. */
  private def qCompactionStrategic(s: SparkSession, dir: String): DataFrame =
    Compaction.strategic(env(s, dir),
        Seq(col("metric_value"), col(Envelope.Offset)))
      .select(col(Envelope.Key),
        round(col("metric_value"), 6).as("metric_r"), col(Envelope.Offset))
      .orderBy(Envelope.Key)

  /** §2.3 partition-count expansion (reference `pulsar-admin topics
    * update-partitions`): the 4-partition log expands to 6, then a new
    * batch key-hash routes over the NEW count — existing rows keep
    * their partition and offsets, new partitions start at offset 0,
    * and the per-partition totals are the mm3%4 originals plus the
    * mm3%6 appends, replayed exactly in the oracle. */
  private def qPartitionUpdate(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-partupd") { r =>
      val tl0 = new graft.log.TopicLog(s, r, name, 4)
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      tl0.append(e): Unit
      val tl6 = graft.log.Admin.updatePartitions(tl0, 6)
      tl6.append(e.filter(col(Envelope.SequenceId) % 5 === 0)): Unit
    }
    new graft.log.TopicLog(s, root, name, 6).read()
      .groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.9 triggerCompaction + readCompacted on the oracle surface
    * (reference Topics.triggerCompaction:2066 → two-phase compactor →
    * CompactedTopicImpl): the first three calendar quartiles append,
    * compaction materializes the snapshot + per-partition horizon, the
    * fourth quartile appends as the uncompacted tail — a readCompacted
    * consumer sees (last non-tombstone value per key at or below the
    * horizon) ∪ (raw tail). The oracle replays the horizon cut, the
    * per-key winner (publish-order = offset order), and the tombstone
    * drop. The offset-order == (publish_time, seq)-order alignment the
    * oracle relies on holds ONLY because the dayofmonth quartile cuts
    * partition publish_time monotonically WITHIN ONE CALENDAR MONTH —
    * the fixture build asserts that precondition loudly, so a
    * multi-month fixture refresh fails here instead of silently
    * diverging the winners. */
  private def qReadCompacted(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-readcompacted") { r =>
      val tl0 = new graft.log.TopicLog(s, r, name, 4)
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      val months = e.select(countDistinct(
        date_format(col(Envelope.PublishTime), "yyyy-MM"))).head().getLong(0)
      require(months == 1L,
        s"read_compacted fixture spans $months calendar months — the " +
          "dayofmonth quartile cuts only align offset order with " +
          "(publish_time, seq) order inside one month; redesign the " +
          "cuts before trusting this oracle")
      val day = dayofmonth(col(Envelope.PublishTime))
      Seq(day <= 8, day > 8 && day <= 15, day > 15 && day <= 23)
        .foreach(p => tl0.append(e.filter(p)): Unit)
      val horizon = Compaction.triggerCompaction(tl0)
      require(horizon.nonEmpty, "compaction fixture is VACUOUS: no horizon")
      tl0.append(e.filter(day > 23)): Unit // the uncompacted tail
    }
    val tl = new graft.log.TopicLog(s, root, name, 4)
    Compaction.readCompactedTopic(tl)
      .groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n_rows"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.4 exact percentiles (median/p25/p75) per event type. */
  private def qMedian(s: SparkSession, dir: String): DataFrame =
    env(s, dir).groupBy("event_type")
      .agg(expr("percentile(metric_value, 0.5)").as("median_value"),
        expr("percentile(metric_value, 0.25)").as("p25"),
        expr("percentile(metric_value, 0.75)").as("p75"))
      .orderBy("event_type")

  /** §2.4 mergeable HLL sketches: per-type sketch + exact distinct in one
    * aggregation. The estimate itself is not SQL-reproducible, so the
    * oracle-checked surface is the self-checking error-bound claim: the
    * query emits `within_bound` = |est − exact| / exact ≤ 5% (HLL p=12 ⇒
    * SE ≈ 1.6%, so 5% is ≥3σ) computed from the sketch IN the query, and
    * the oracle asserts the exact counts plus `TRUE` — a broken sketch or
    * estimator flips the column and breaks the hash match. Tighter bounds
    * and merge algebra are covered by HllSpec. */
  private def qHllCardinality(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hll
    env(s, dir).groupBy("event_type")
      .agg(Hll.hll_sketch(col(Envelope.Key)).as("sk"),
        countDistinct(Envelope.Key).cast("bigint").as("exact"))
      .select(col("event_type"), col("exact"),
        (abs(Hll.hll_estimate(col("sk")).cast("double") - col("exact")) <=
          col("exact") * lit(0.05)).as("within_bound"))
      .orderBy("event_type")
  }

  /** §2.4 frequency sketch (Count-Min) heavy hitters: ONE map-side-
    * combined pass builds a mergeable d×w sketch of the whole log (no
    * per-key shuffle for the sketch — at 100 TB the sketch is the only
    * thing that crosses the wire, ~80 KB), then the true top-10 keys are
    * probed against it. Like hll_cardinality, the estimate is not
    * SQL-reproducible, so the oracle-checked surface is the CMS
    * guarantee evaluated IN the query: `lower_ok` = est ≥ exact (CMS
    * never undercounts — deterministic), `upper_ok` = est ≤ exact +
    * ceil(e/w · N) (the Cormode-Muthukrishnan ε·N bound). A broken
    * update/merge/estimate path flips a bool and breaks the hash. */
  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Cms
    val e = env(s, dir)
    val sk = e.agg(Cms.cms_sketch(col(Envelope.Key)).as("sk"),
      count(lit(1)).as("n_total"))
    val top = e.groupBy(Envelope.Key)
      .agg(count(lit(1)).cast("bigint").as("exact_n"))
      .orderBy(col("exact_n").desc, col(Envelope.Key))
      .limit(10)
    val est = Cms.cms_estimate(col("sk"), col(Envelope.Key))
    top.crossJoin(broadcast(sk))
      .select(col(Envelope.Key), col("exact_n"),
        (est >= col("exact_n")).as("lower_ok"),
        (est <= col("exact_n") +
          ceil(col("n_total") * lit(math.E / Cms.DefaultWidth)).cast("long"))
          .as("upper_ok"))
      .orderBy(col("exact_n").desc, col(Envelope.Key))
  }

  /** The NESTED envelope both SerDe roundtrips encode: scalars + a
    * nested struct + a properties map + a repeated ids list, all
    * derived deterministically from envelope columns so the identity
    * oracle can recompute every flattened output in pure SQL. */
  private def serdeNestedInput(e: DataFrame): DataFrame =
    e.select(col(Envelope.Offset).cast("long").as("offset"),
      col(Envelope.Key).as("key"), col(Envelope.Value).as("value"),
      col("event_type"),
      struct(substring(col("event_type"), 1, 2).as("lang"),
        coalesce(length(col(Envelope.Value)).cast("long"), lit(-1L)).as("n"))
        .as("meta"),
      map(lit("et"), col("event_type"), lit("k"), col(Envelope.Key)).as("props"),
      array(col(Envelope.Offset).cast("long"),
        col(Envelope.Offset).cast("long") + 1).as("ids"))

  /** Post-decode flattening shared by both roundtrips: nested fields
    * surface as scalar columns (map probed by key, array joined to csv)
    * so the DuckDB hash compare stays on scalar ground. */
  private def serdeFlatten(decoded: DataFrame): DataFrame =
    decoded.select(col("d.offset").as("offset"), col("d.key").as("key"),
      col("d.value").as("value"), col("d.event_type").as("event_type"),
      col("d.meta.lang").as("meta_lang"), col("d.meta.n").as("meta_n"),
      element_at(col("d.props"), "et").as("prop_et"),
      element_at(col("d.props"), "k").as("prop_k"),
      array_join(transform(col("d.ids"), _.cast("string")), ",").as("ids_csv"))
      .orderBy("offset")

  /** Schema-registry AVRO SerDe (§1.2): every envelope row encodes to
    * real Avro single-record binary — scalars, a [null,string] union, a
    * NESTED RECORD, a MAP and an ARRAY — and decodes back IN the query.
    * The oracle recomputes the flattened projection: any wire-format,
    * union-branch or nesting defect surfaces as a value/hash mismatch. */
  private def qAvroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AvroSerde
    val schemaJson =
      """{"type":"record","name":"env","fields":[
        |{"name":"offset","type":"long"},
        |{"name":"key","type":"string"},
        |{"name":"value","type":["null","string"],"default":null},
        |{"name":"event_type","type":"string"},
        |{"name":"meta","type":{"type":"record","name":"m","fields":[
        |  {"name":"lang","type":"string"},{"name":"n","type":"long"}]}},
        |{"name":"props","type":{"type":"map","values":"string"}},
        |{"name":"ids","type":{"type":"array","items":"long"}}]}""".stripMargin
    // widen the single-split events scan: the nested encode+decode
    // kernel is the whole wall (~0.2 ms/row single-threaded otherwise)
    val in = ext.TextOps.ensureParallelism(serdeNestedInput(env(s, dir)))
    val enc = AvroSerde.avro_encode(
      struct(in.columns.map(col).toIndexedSeq: _*), schemaJson)
    serdeFlatten(in.select(AvroSerde.avro_decode(enc, schemaJson).as("d")))
  }

  /** Schema-registry PROTOBUF_NATIVE SerDe (§1.2): same nested
    * identity-oracle pattern as [[qAvroRoundtrip]] over the hand-rolled
    * wire-format codec — tombstones exercise proto3 field omission and
    * presence; the nested struct / map / packed repeated field exercise
    * length-delimited submessages, map-entry messages and packed
    * encoding. */
  private def qProtoRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ProtoSerde
    val spec = "1:int64:offset,2:string:key,3:string:value,4:string:event_type," +
      "5:message{1:string:lang,2:int64:n}:meta," +
      "6:map{string,string}:props,7:repeated int64:ids"
    // widen the single-split events scan: the nested encode+decode
    // kernel is the whole wall (~0.2 ms/row single-threaded otherwise)
    val in = ext.TextOps.ensureParallelism(serdeNestedInput(env(s, dir)))
    val enc = ProtoSerde.proto_encode(
      struct(in.columns.map(col).toIndexedSeq: _*), spec)
    serdeFlatten(in.select(ProtoSerde.proto_decode(enc, spec).as("d")))
  }

  /** §2.4 SpaceSaving top-k (the deterministic-guarantee heavy-hitter
    * sketch): one map-side-combined pass tracks m=64 counters over the
    * whole log; the certificate evaluates the Metwally guarantees IN the
    * query — tracked top-10 keys must satisfy `est−err ≤ exact ≤ est`
    * and `err ≤ floor(N/m)`; an untracked top-10 key must satisfy
    * `exact ≤ floor(N/m)` (anything heavier is guaranteed tracked).
    * Always-true booleans for a correct sketch regardless of Spark's
    * nondeterministic partition-merge order, so the hash is stable. */
  private def qSpaceSavingTopk(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.SpaceSaving
    val m = 64
    val e = env(s, dir)
    val sk = e.agg(SpaceSaving.ss_sketch(col(Envelope.Key), m).as("sk"),
      count(lit(1)).as("n_total"))
    val top = e.groupBy(Envelope.Key)
      .agg(count(lit(1)).cast("bigint").as("exact_n"))
      .orderBy(col("exact_n").desc, col(Envelope.Key))
      .limit(10)
    val probe = SpaceSaving.ss_probe(col("sk"), col(Envelope.Key))
    val cap = floor(col("n_total").cast("double") / m).cast("long")
    top.crossJoin(broadcast(sk))
      .select(col(Envelope.Key), col("exact_n"),
        when(probe.getField("tracked"),
          probe.getField("est") >= col("exact_n") &&
            probe.getField("est") - probe.getField("err") <= col("exact_n") &&
            probe.getField("err") <= cap)
          .otherwise(col("exact_n") <= cap)
          .as("guarantee_ok"))
      .orderBy(col("exact_n").desc, col(Envelope.Key))
  }

  /** §2.4 mergeable quantile sketch (KMV bottom-k row sample): per-type
    * sketches built in one pass, median probed from the sample. The
    * certificate is the TRUE rank of the estimated median, computed
    * exactly against the log: |rank − 0.5| ≤ 5% (k=1024 ⇒ σ ≈ 1.6%,
    * so 5% is ≥3σ — the [[qHllCardinality]] margin pattern). */
  private def qQuantileSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Kmv
    val e = env(s, dir)
    val withEst = e.groupBy("event_type")
      .agg(Kmv.kmv_sketch(col("metric_value"), col(Envelope.Offset)).as("sk"),
        count(lit(1)).cast("bigint").as("n"))
      .select(col("event_type"), col("n"),
        Kmv.kmv_quantile(col("sk"), lit(0.5)).as("est_p50"))
    val ranks = e.join(broadcast(withEst), "event_type")
      .groupBy("event_type")
      .agg((sum(when(col("metric_value") <= col("est_p50"), 1L).otherwise(0L))
        .cast("double") / count(lit(1))).as("true_rank"))
    withEst.join(ranks, "event_type")
      .select(col("event_type"), col("n"),
        (abs(col("true_rank") - 0.5) <= 0.05).as("rank_ok"))
      .orderBy("event_type")
  }

  /** §2.7 keyed counters per user. */
  private def qCounters(s: SparkSession, dir: String): DataFrame =
    Windows.counters(env(s, dir), Envelope.Key)
      .withColumn("counter", col("counter").cast("bigint"))
      .orderBy(Envelope.Key)

  /** §2.1 multi-topic subscribe: union of two topic streams. */
  private def qMultiTopicUnion(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val t1 = e.filter(col("event_type") === "purchase")
    val t2 = e.filter(col("event_type") === "click")
    t1.unionByName(t2)
      .groupBy("event_type").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("event_type")
  }

  /** §2.1 DYNAMIC pattern subscribe (reference
    * PatternMultiTopicsConsumerImpl + TopicListWatcher semantics, the
    * PatternTopicsConsumerTest behaviors): the regex re-resolves per
    * microbatch, so evt-error — created only AFTER the first poll
    * already ran — contributes rows, while the simultaneously created
    * non-matching other-view never does. A once-resolved implementation
    * (the pre-r10 batch subscribePattern) would miss evt-error and
    * hash-mismatch. Fresh temp root + cursor per invocation: the
    * create-after-start sequence is the semantics under test, so it
    * must replay on every rep (dirs are GC'd by the shutdown hook). */
  private def qPatternSubscribe(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-pattern")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pattern-ckpt")
    streamOutRoots.add(root); streamOutRoots.add(ckpt)
    val base = env(s, dir).filter(col(Envelope.Offset) < 3000)
      .drop(Envelope.Topic, Envelope.Partition)
    def mk(topic: String, etype: String): Unit =
      new graft.log.TopicLog(s, root.toString,
        graft.model.TopicName.parse(topic))
        .append(base.filter(col("event_type") === etype)): Unit
    mk("evt-purchase", "purchase"); mk("evt-click", "click")
    val sub = new graft.streaming.PatternSubscription(s, root.toString,
      "public", "default", "evt-.*", "oracle-sub", ckpt.toString)
    val batches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    require(sub.poll((df, _) => { batches += df; () }) > 0,
      "initial match set must dispatch")
    mk("evt-error", "error"); mk("other-view", "view")
    require(sub.drain((df, _) => { batches += df; () }) > 0,
      "the mid-subscription topic must be discovered")
    batches.reduce(_.unionByName(_, allowMissingColumns = true))
      .groupBy("event_type").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("event_type")
  }

  /** §2.10 Key_Shared ring assignment (murmur3 — rows-only oracle). */
  private def qKeyShared(s: SparkSession, dir: String): DataFrame =
    Dispatch.keySharedAssign(env(s, dir), 4)
      .groupBy("consumer_id").agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"))
      .orderBy("consumer_id")

  /** §2.2 chunking: split value into 4-byte chunks, reassemble, prove
    * content equality (output = the reassembled payloads themselves). */
  private def qChunkReassembly(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir).filter(col(Envelope.Value).isNotNull &&
      col(Envelope.Offset) < 100)
      .select(col(Envelope.Offset), col(Envelope.Value))
    val chunks = operators.Chunking.split(e, Envelope.Value, chunkSize = 4,
      uuidCols = Seq(Envelope.Offset))
    operators.Chunking.reassemble(chunks)
      .select(col("chunk_uuid"), col("payload"))
      .orderBy("chunk_uuid")
  }

  /** §2.2 chunk reassembly on the CONSUME path (reference
    * ConsumerImpl.processMessageChunk buffers partial uuid groups
    * across deliveries; MessageChunkingTest): each uuid's chunks are
    * SCATTERED across 4 fixture files replayed one per trigger, so no
    * single microbatch ever sees a whole group — the
    * flatMapGroupsWithState buffer must carry partial groups across
    * triggers and emit each payload exactly once. Output hash-matches
    * the batch chunk_reassembly row (same oracle). */
  private def qChunkReassemblyStream(s: SparkSession, dir: String): DataFrame = {
    val root = Fixtures.dir(s, dir, "q-chunkstream") { r =>
      val e = env(s, dir).filter(col(Envelope.Value).isNotNull &&
        col(Envelope.Offset) < 100)
        .select(col(Envelope.Offset), col(Envelope.Value))
      val chunks = operators.Chunking.split(e, Envelope.Value, chunkSize = 4,
        uuidCols = Seq(Envelope.Offset))
      // 2 parity slices: every multi-chunk uuid still splits across
      // triggers (the buffering contract), at half the per-trigger
      // overhead of finer scatters; deeper 3-batch interleavings are
      // pinned by ChunkStreamSpec's MemoryStream cases
      val base = System.currentTimeMillis() - 16000L
      (0 until 2).foreach { i =>
        writeStreamSlice(chunks.filter(pmod(col("chunk_id"), lit(2)) === i),
          r, f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val schema = s.read.parquet(root).schema
    val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet").parquet(root)
    runStreamToLocal(s, operators.Chunking.reassembleStream(stream),
        mode = "append")
      .orderBy("chunk_uuid")
  }

  /** §2.2 message crypto: encrypt+decrypt round trip — output counts of
    * rows whose decrypted value equals the original (oracle = plain
    * envelope counts, so any crypto loss breaks the hash match). */
  private def qCryptoRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val key = "0123456789abcdef"
    val e = env(s, dir).filter(col(Envelope.Value).isNotNull)
    val roundtrip = operators.Produce.decryptValue(
      operators.Produce.encryptValue(
        e.withColumn("orig", col(Envelope.Value)), key), key)
    roundtrip.filter(col(Envelope.Value) === col("orig"))
      .groupBy("event_type").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("event_type")
  }

  /** §2.3 backlog quota: per-partition backlog + eviction cursor. */
  private def qBacklogQuota(s: SparkSession, dir: String): DataFrame =
    graft.log.Admin.backlogQuota(env(s, dir),
        Map(0 -> -1L, 1 -> -1L, 2 -> -1L, 3 -> -1L), quotaMessages = 1000)
      .select(col(Envelope.Partition), col("backlog").cast("bigint").as("backlog"),
        col("head"), col("over_quota"), col("evict_to"))
      .orderBy(Envelope.Partition)

  /** §2.3 admin skip: cursor after skipping 100 messages per partition. */
  private def qAdminSkip(s: SparkSession, dir: String): DataFrame =
    Dispatch.skipMessages(env(s, dir),
        Map(0 -> -1L, 1 -> -1L, 2 -> -1L, 3 -> -1L), n = 100)
      .orderBy(Envelope.Partition)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "compaction_publish" -> (qCompactionPublish _),
    "compaction_eventtime" -> (qCompactionEventTime _),
    "tableview" -> (qTableView _),
    "tableview_stream" -> (qTableViewStream _),
    "quality_filter_stream" -> (qQualityFilterStream _),
    "dedup_seq" -> (qDedupSeq _),
    "dedup_stats" -> (qDedupStats _),
    "delayed_due" -> (qDelayedDue _),
    "delayed_due_stream" -> (qDelayedDueStream _),
    "ttl_expiry" -> (qTtl _),
    "seek_by_time" -> (qSeekByTime _),
    "last_message_ids" -> (qLastIds _),
    "peek_messages" -> (qPeek _),
    "examine_message" -> (qExamine _),
    "dlq_route" -> (qDlqRoute _),
    "dlq_route_stream" -> (qDlqRouteStream _),
    "redelivery" -> (qRedelivery _),
    "redelivery_stream" -> (qRedeliveryStream _),
    "schema_evolution" -> (qSchemaEvolution _),
    "repl_cursor" -> (qReplCursor _),
    "replication_filter" -> (qReplication _),
    "replication_filter_stream" -> (qReplicationStream _),
    "window_tumbling" -> (qWindowTumbling _),
    "window_tumbling_stream" -> (qWindowTumblingStream _),
    "window_sliding" -> (qWindowSliding _),
    "window_count" -> (qWindowCount _),
    "window_count_sliding" -> (qWindowCountSliding _),
    "session_windows" -> (qSessionWindows _),
    "session_windows_stream" -> (qSessionWindowsStream _),
    "session_windows_watermark" -> (qSessionWindowsWatermark _),
    "q_median" -> (qMedian _),
    "hll_cardinality" -> (qHllCardinality _),
    "heavy_hitters" -> (qHeavyHitters _),
    "spacesaving_topk" -> (qSpaceSavingTopk _),
    "avro_roundtrip" -> (qAvroRoundtrip _),
    "proto_roundtrip" -> (qProtoRoundtrip _),
    "quantile_sketch" -> (qQuantileSketch _),
    "counters" -> (qCounters _),
    "multi_topic_union" -> (qMultiTopicUnion _),
    "pattern_subscribe" -> (qPatternSubscribe _),
    "keyshared_assign" -> (qKeyShared _),
    "compaction_strategic" -> (qCompactionStrategic _),
    "read_compacted" -> (qReadCompacted _),
    "partition_update" -> (qPartitionUpdate _),
    "chunk_reassembly" -> (qChunkReassembly _),
    "chunk_reassembly_stream" -> (qChunkReassemblyStream _),
    "crypto_roundtrip" -> (qCryptoRoundtrip _),
    "backlog_quota" -> (qBacklogQuota _),
    "admin_skip" -> (qAdminSkip _)
  )

  def oracleSql: Map[String, String] = Map(
    "compaction_publish" -> envSql(
      """SELECT key, value, "offset" FROM (
        |  SELECT key, value, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY "offset" DESC) AS rn
        |  FROM envelope) t
        |WHERE rn = 1 AND value IS NOT NULL ORDER BY key""".stripMargin),
    "compaction_eventtime" -> envSql(
      """SELECT key, value, "offset" FROM (
        |  SELECT key, value, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY event_time DESC, "offset" DESC) AS rn
        |  FROM envelope) t
        |WHERE rn = 1 AND value IS NOT NULL ORDER BY key""".stripMargin),
    "tableview" -> envSql(
      """SELECT event_type, metric_value FROM (
        |  SELECT event_type, metric_value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY "offset" DESC) AS rn
        |  FROM envelope) t
        |WHERE rn = 1 AND metric_value IS NOT NULL ORDER BY event_type""".stripMargin),
    // the STREAMING TableView must converge to the same end state as the
    // batch view — identical oracle,
    "tableview_stream" -> envSql(
      """SELECT event_type, metric_value FROM (
        |  SELECT event_type, metric_value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY "offset" DESC) AS rn
        |  FROM envelope) t
        |WHERE rn = 1 AND metric_value IS NOT NULL ORDER BY event_type""".stripMargin),
    "quality_filter_stream" ->
      """WITH q AS (
        |  SELECT doc_id, text, lang,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS mwl
        |  FROM documents),
        |f AS (SELECT * FROM q WHERE n_tokens >= 10 AND mwl BETWEEN 2.0 AND 12.0),
        |d AS (
        |  SELECT lang, md5(text) AS h, MIN(n_tokens) AS toks
        |  FROM f GROUP BY lang, md5(text))
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS total_tokens
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    // Entropy: the kernel's H = round(ln n - (Σ c·round(ln c, 9))/n, 6)
    // recomputed as explode → histogram → exact decimal aggregate
    // the final `+ 0.0` folds IEEE -0.0 (uniform text rounds to a tiny
    // negative before round(,6)) to the kernel's +0.0; the LEFT JOIN
    // keeps empty-text (score 0.0) and NULL-text (score NULL) rows the
    // unnest would otherwise drop,
    "dedup_seq" -> envSql(
      """SELECT producer_name, sequence_id, "offset" FROM (
        |  SELECT producer_name, sequence_id, "offset",
        |    MAX(sequence_id) OVER (PARTITION BY producer_name ORDER BY "offset"
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM envelope) t
        |WHERE prev_max IS NULL OR sequence_id > prev_max
        |ORDER BY producer_name, "offset"""".stripMargin),
    "dedup_stats" -> envSql(
      """SELECT r.producer_name, r.received, k.kept,
        |  CAST(r.received - k.kept AS BIGINT) AS dropped
        |FROM (SELECT producer_name, CAST(COUNT(*) AS BIGINT) AS received
        |      FROM envelope GROUP BY producer_name) r
        |JOIN (SELECT producer_name, CAST(COUNT(*) AS BIGINT) AS kept FROM (
        |    SELECT producer_name,
        |      MAX(sequence_id) OVER (PARTITION BY producer_name ORDER BY "offset"
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max,
        |      sequence_id FROM envelope) t
        |  WHERE prev_max IS NULL OR sequence_id > prev_max
        |  GROUP BY producer_name) k USING (producer_name)
        |ORDER BY producer_name""".stripMargin),
    "delayed_due" -> envSql(
      """SELECT "offset", partition FROM envelope
        |WHERE deliver_at IS NULL OR deliver_at <= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY "offset"""".stripMargin),
    // the streaming dispatch gate must emit the identical dispatchable set,
    "delayed_due_stream" -> envSql(
      """SELECT "offset", partition FROM envelope
        |WHERE deliver_at IS NULL OR deliver_at <= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY "offset"""".stripMargin),
    "ttl_expiry" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM envelope
        |WHERE publish_time >= (SELECT MAX(publish_time) FROM envelope) - INTERVAL 7 DAY
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
    "seek_by_time" -> envSql(
      """SELECT partition, MIN("offset") AS seek_offset FROM envelope
        |WHERE publish_time >= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY partition ORDER BY partition""".stripMargin),
    "last_message_ids" -> envSql(
      """SELECT partition, MAX("offset") AS last_offset FROM envelope
        |GROUP BY partition ORDER BY partition""".stripMargin),
    "peek_messages" -> envSql(
      """SELECT partition, "offset", key FROM (
        |  SELECT partition, "offset", key,
        |    ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") AS rn
        |  FROM envelope) t WHERE rn <= 10 ORDER BY partition, "offset"""".stripMargin),
    "examine_message" -> envSql(
      """SELECT * FROM (
        |  SELECT 'earliest' AS from_pos, partition, "offset", key FROM (
        |    SELECT partition, "offset", key,
        |      ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") AS rn
        |    FROM envelope) t WHERE rn = 5
        |  UNION ALL
        |  SELECT 'latest' AS from_pos, partition, "offset", key FROM (
        |    SELECT partition, "offset", key,
        |      ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset" DESC) AS rn
        |    FROM envelope) t WHERE rn = 3) u
        |ORDER BY from_pos, partition""".stripMargin),
    // unacked-timeout redelivery: delivered = even offsets (at
    // publish_time), acked = every 4th; timed out = delivered, unacked,
    // publish_time at least ackTimeout (1 h) before "now"; the
    // redelivered row carries count+1 and now + 60s·2^(old count),
    "dlq_route" -> envSql(
      """SELECT CASE WHEN redelivery_count >= 3
        |  THEN topic || '-sub1-DLQ' ELSE topic || '-sub1-RETRY' END AS route_topic,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM envelope GROUP BY 1 ORDER BY route_topic""".stripMargin),
    // streaming routing converges to the identical counts,
    "dlq_route_stream" -> envSql(
      """SELECT CASE WHEN redelivery_count >= 3
        |  THEN topic || '-sub1-DLQ' ELSE topic || '-sub1-RETRY' END AS route_topic,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM envelope GROUP BY 1 ORDER BY route_topic""".stripMargin),
    "redelivery" -> redeliverySql,
    // the streaming twin redelivers the identical set on the identical
    // schedule — ONE shared oracle string (the txnAckSql pattern), so an
    // edit to the backoff formula can never diverge the two twins,
    "redelivery_stream" -> redeliverySql,
    // AUTO_CONSUME two-live-versions decode: v1 rows (even offsets)
    // carry only uid; v2 rows carry user_name + score — union_by_name
    // semantics replayed as per-parity CASEs over the payload formulas,
    "schema_evolution" -> envSql(
      """SELECT "offset",
        |  CAST(CASE WHEN "offset" % 2 = 0 THEN 1 ELSE 2 END AS INT) AS schema_version,
        |  CASE WHEN "offset" % 2 = 0 THEN key END AS uid,
        |  CASE WHEN "offset" % 2 = 1 THEN key END AS user_name,
        |  CASE WHEN "offset" % 2 = 1 THEN round(metric_value, 6) END AS score_r
        |FROM envelope ORDER BY "offset"""".stripMargin),
    // replicated-subscription cursor translation: remote = block-reversed
    // re-offset of the same rows; acked identities = local rows at or
    // below the 60% cursor; markDelete = longest remote prefix entirely
    // acked (running MIN over the ack flag), resume = rows above it,
    "repl_cursor" -> envSql(
      """, cur AS (
        |  SELECT partition, (MAX("offset") * 3) // 5 AS md
        |  FROM envelope GROUP BY partition),
        |remote AS (
        |  SELECT partition, producer_name, sequence_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY partition
        |      ORDER BY "offset" // 10, "offset" % 10 DESC, "offset")
        |      AS BIGINT) AS r_offset
        |  FROM envelope),
        |acked AS (
        |  SELECT DISTINCT e.producer_name, e.sequence_id
        |  FROM envelope e JOIN cur c
        |    ON e.partition = c.partition AND e."offset" <= c.md),
        |flags AS (
        |  SELECT r.partition, r.r_offset,
        |    CASE WHEN a.producer_name IS NOT NULL THEN 1 ELSE 0 END AS ack
        |  FROM remote r LEFT JOIN acked a
        |    ON r.producer_name = a.producer_name
        |   AND r.sequence_id = a.sequence_id),
        |pref AS (
        |  SELECT partition, r_offset,
        |    MIN(ack) OVER (PARTITION BY partition ORDER BY r_offset
        |      ROWS UNBOUNDED PRECEDING) AS ok
        |  FROM flags),
        |mdp AS (
        |  SELECT partition, MAX(r_offset) AS mark_delete
        |  FROM pref WHERE ok = 1 GROUP BY partition),
        |resume AS (
        |  SELECT f.partition, CAST(COUNT(*) AS BIGINT) AS resume_n
        |  FROM flags f JOIN mdp m ON f.partition = m.partition
        |  WHERE f.r_offset > m.mark_delete GROUP BY f.partition),
        |snap AS (
        |  SELECT partition, MAX("offset") AS snap_local,
        |    CAST(COUNT(*) AS BIGINT) AS snap_remote
        |  FROM envelope GROUP BY partition)
        |SELECT s.partition, s.snap_local, s.snap_remote, m.mark_delete,
        |  COALESCE(r.resume_n, 0) AS resume_n
        |FROM snap s JOIN mdp m ON s.partition = m.partition
        |LEFT JOIN resume r ON s.partition = r.partition
        |ORDER BY s.partition""".stripMargin),
    "replication_filter" -> envSql(
      """SELECT replicated_from, CAST(COUNT(*) AS BIGINT) AS n FROM envelope
        |WHERE (replicated_from IS NULL OR replicated_from <> 'cluster-1')
        |  AND (replicated_from IS NULL OR replicated_from <> 'cluster-0')
        |GROUP BY replicated_from ORDER BY replicated_from""".stripMargin),
    // the continuous replicator's loop filter converges to the same counts,
    "replication_filter_stream" -> envSql(
      """SELECT replicated_from, CAST(COUNT(*) AS BIGINT) AS n FROM envelope
        |WHERE (replicated_from IS NULL OR replicated_from <> 'cluster-1')
        |  AND (replicated_from IS NULL OR replicated_from <> 'cluster-0')
        |GROUP BY replicated_from ORDER BY replicated_from""".stripMargin),
    "window_tumbling" -> envSql(
      """SELECT strftime(date_trunc('hour', event_time), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(metric_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM envelope GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    // stateful STREAMING window aggregation must converge to the batch
    // tumbling result — identical oracle,
    "window_tumbling_stream" -> envSql(
      """SELECT strftime(date_trunc('hour', event_time), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(metric_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM envelope GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    "window_sliding" -> envSql(
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (
        |  SELECT event_type,
        |    time_bucket(INTERVAL 30 MINUTE, event_time) - k * INTERVAL 30 MINUTE AS ws
        |  FROM envelope CROSS JOIN (SELECT UNNEST([0, 1]) AS k) ks) t
        |GROUP BY ws, event_type ORDER BY wstart, event_type""".stripMargin),
    "window_count" -> envSql(
      """SELECT key, window_id,
        |  CAST(SUM(CAST(metric_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MAX("offset") AS last_offset
        |FROM (
        |  SELECT key, metric_value, "offset",
        |    CAST((ROW_NUMBER() OVER (PARTITION BY key ORDER BY "offset") - 1) // 20 AS BIGINT) AS window_id
        |  FROM envelope) t
        |GROUP BY key, window_id HAVING COUNT(*) = 20
        |ORDER BY key, window_id""".stripMargin),
    "window_count_sliding" -> envSql(
      """SELECT key, trigger_id, w_sum, w_max FROM (
        |  SELECT key,
        |    ROW_NUMBER() OVER w AS rn,
        |    COUNT(*) OVER f AS w_count,
        |    CAST(SUM(CAST(metric_value AS DECIMAL(18,2))) OVER f AS DOUBLE) AS w_sum,
        |    CAST(CAST(MAX(CAST(metric_value AS DECIMAL(18,2))) OVER f AS DECIMAL(18,2)) AS DOUBLE) AS w_max,
        |    CAST(ROW_NUMBER() OVER w // 10 AS BIGINT) AS trigger_id
        |  FROM envelope
        |  WINDOW w AS (PARTITION BY key ORDER BY "offset"),
        |         f AS (PARTITION BY key ORDER BY "offset"
        |               ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)) t
        |WHERE rn % 10 = 0 AND w_count = 25
        |ORDER BY key, trigger_id""".stripMargin),
    "session_windows" -> envSql(
      """SELECT key, CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM (
        |  SELECT key, SUM(new_s) OVER (PARTITION BY key ORDER BY event_time, "offset"
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT key, event_time, "offset",
        |      CASE WHEN LAG(event_time) OVER w IS NULL
        |           OR event_time - LAG(event_time) OVER w >= INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_s
        |    FROM envelope WINDOW w AS (PARTITION BY key ORDER BY event_time, "offset")
        |  ) m) t
        |GROUP BY key ORDER BY key""".stripMargin),
    // the same islands derivation, emitted per session: the streaming
    // session_window state machine must land exactly these rows,
    "session_windows_stream" -> envSql(
      """SELECT key,
        |  strftime(MIN(event_time), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (
        |  SELECT key, event_time, SUM(new_s) OVER (PARTITION BY key
        |    ORDER BY event_time, "offset" ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT key, event_time, "offset",
        |      CASE WHEN LAG(event_time) OVER w IS NULL
        |           OR event_time - LAG(event_time) OVER w >= INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_s
        |    FROM envelope WINDOW w AS (PARTITION BY key ORDER BY event_time, "offset")
        |  ) m) t
        |GROUP BY key, sid ORDER BY key, session_start""".stripMargin),
    // identical islands replay for the BOUNDED-STATE (watermark +
    // append) configuration — session semantics are order-independent,
    // so the time-reordered fixture must land exactly the same rows;
    // any watermark-dropped event or doubly-emitted session mismatches,
    "session_windows_watermark" -> envSql(
      """SELECT key,
        |  strftime(MIN(event_time), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (
        |  SELECT key, event_time, SUM(new_s) OVER (PARTITION BY key
        |    ORDER BY event_time, "offset" ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT key, event_time, "offset",
        |      CASE WHEN LAG(event_time) OVER w IS NULL
        |           OR event_time - LAG(event_time) OVER w >= INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_s
        |    FROM envelope WINDOW w AS (PARTITION BY key ORDER BY event_time, "offset")
        |  ) m) t
        |GROUP BY key, sid ORDER BY key, session_start""".stripMargin),
    "q_median" -> envSql(
      """SELECT event_type,
        |  quantile_cont(metric_value, 0.5) AS median_value,
        |  quantile_cont(metric_value, 0.25) AS p25,
        |  quantile_cont(metric_value, 0.75) AS p75
        |FROM envelope GROUP BY event_type ORDER BY event_type""".stripMargin),
    "hll_cardinality" -> envSql(
      """SELECT event_type, CAST(COUNT(DISTINCT key) AS BIGINT) AS exact,
        |  TRUE AS within_bound
        |FROM envelope GROUP BY event_type ORDER BY event_type""".stripMargin),
    // same certificate pattern: exact counts + the KMV rank-error bool,
    "heavy_hitters" -> envSql(
      """SELECT key, exact_n, TRUE AS lower_ok, TRUE AS upper_ok FROM (
        |  SELECT key, CAST(COUNT(*) AS BIGINT) AS exact_n
        |  FROM envelope GROUP BY key
        |  ORDER BY exact_n DESC, key LIMIT 10) t
        |ORDER BY exact_n DESC, key""".stripMargin),
    // avro round-trip: nested identity projection — a wire-format,
    // union-branch or record/map/array nesting defect breaks the hash,
    "spacesaving_topk" -> envSql(
      """SELECT key, exact_n, TRUE AS guarantee_ok FROM (
        |  SELECT key, CAST(COUNT(*) AS BIGINT) AS exact_n
        |  FROM envelope GROUP BY key
        |  ORDER BY exact_n DESC, key LIMIT 10) t
        |ORDER BY exact_n DESC, key""".stripMargin),
    "avro_roundtrip" -> serdeNestedOracle,
    // same nested identity oracle: the protobuf wire round-trip (incl.
    // submessages, map entries, packed repeated) must be lossless,
    "proto_roundtrip" -> serdeNestedOracle,
    // SpaceSaving certificate: the Metwally bounds are always-true for a
    // correct sketch, so the oracle is the exact top-10 + TRUE,
    "quantile_sketch" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, TRUE AS rank_ok
        |FROM envelope GROUP BY event_type ORDER BY event_type""".stripMargin),
    // same certificate pattern: exact top-10 + the CMS bound booleans,
    "counters" -> envSql(
      """SELECT key, CAST(COUNT(*) AS BIGINT) AS counter FROM envelope
        |GROUP BY key ORDER BY key""".stripMargin),
    "multi_topic_union" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT * FROM envelope WHERE event_type = 'purchase'
        |  UNION ALL SELECT * FROM envelope WHERE event_type = 'click') t
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
    // the dynamic-discovery contract in SQL: the final topic set's union
    // — purchase + click (pre-subscription) + error (created mid-
    // subscription, matched) — and NOTHING from the non-matching view
    // topic. A subscriber that resolved the pattern once misses 'error'.,
    "pattern_subscribe" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM envelope
        |WHERE "offset" < 3000
        |  AND event_type IN ('purchase', 'click', 'error')
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
    "keyshared_assign" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), slots AS (
        |  SELECT key,
        |    CAST(least((mm3_8(key) % 65536) // 16384, 3) AS INT) AS consumer_id
        |  FROM envelope)
        |SELECT consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys
        |FROM slots GROUP BY consumer_id ORDER BY consumer_id""".stripMargin),
    // Both consistent-hash rings rebuilt in pure SQL: point = mm3_8 of
    // the "consumer-i" name; ceiling lookup = first (point, owner) with
    // point >= slot, wrapping to the smallest point — the same
    // tie-break order as Dispatch.ringAssign's stable sort.,
    "compaction_strategic" -> envSql(
      """SELECT key, round(metric_value, 6) AS metric_r, "offset"
        |FROM (
        |  SELECT key, value, metric_value, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY key
        |      ORDER BY metric_value DESC, "offset" DESC) AS rn
        |  FROM envelope) t
        |WHERE rn = 1 AND value IS NOT NULL
        |ORDER BY key""".stripMargin),
    // partition expansion: originals at mm3%4 keep their slots and
    // offsets; the sequence_id%5 append routes over the NEW count (6),
    // with partitions 4-5 starting dense at 0,
    "read_compacted" -> (mm3Macros +
      s"WITH ${graft.model.Envelope.duckdbCte},\n" +
      """r AS (
        |  SELECT key, value, publish_time AS pt, sequence_id AS seq,
        |    date_part('day', publish_time) AS d,
        |    CAST(mm3_8(key) % 4 AS INT) AS partition
        |  FROM envelope
        |), snap AS (
        |  SELECT key, partition FROM (
        |    SELECT key, partition, value,
        |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY pt DESC, seq DESC) AS rn
        |    FROM r WHERE d <= 23) t
        |  WHERE rn = 1 AND value IS NOT NULL
        |), tl AS (SELECT key, partition FROM r WHERE d > 23),
        |uni AS (SELECT key, partition FROM snap
        |        UNION ALL SELECT key, partition FROM tl),
        |tot AS (SELECT partition, COUNT(*) AS total FROM r GROUP BY partition)
        |SELECT u.partition, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT u.key) AS BIGINT) AS n_keys,
        |  CAST(t.total - 1 AS BIGINT) AS max_offset
        |FROM uni u JOIN tot t ON u.partition = t.partition
        |GROUP BY u.partition, t.total ORDER BY u.partition""".stripMargin),
    "partition_update" -> (mm3Macros +
      s"WITH ${graft.model.Envelope.duckdbCte},\n" +
      """routed AS (
        |  SELECT CAST(mm3_8(key) % 4 AS INT) AS partition FROM envelope
        |  UNION ALL
        |  SELECT CAST(mm3_8(key) % 6 AS INT) AS partition FROM envelope
        |  WHERE sequence_id % 5 = 0)
        |SELECT partition, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) - 1 AS BIGINT) AS max_offset
        |FROM routed GROUP BY partition ORDER BY partition""".stripMargin),
    // strategic compaction: max-(metric, offset) winner per key, null
    // values tombstoned after selection — see qCompactionStrategic.
    // retention_trim: file-granular survivors (day>15 files whole);
    // min surviving offset = count of trimmed (day<=15) rows/partition
    // triggerCompaction horizon cut: per-key last non-tombstone among
    // day<=23 (offset order == (publish_time, seq) order under quartile
    // appends), union the raw day>23 tail; rows re-route by mm3%4,
    "chunk_reassembly" -> envSql(
      """SELECT CAST("offset" AS VARCHAR) AS chunk_uuid, value AS payload
        |FROM envelope WHERE value IS NOT NULL AND "offset" < 100
        |ORDER BY chunk_uuid""".stripMargin),
    // the streaming consume-path twin must land the identical payloads
    // even though no microbatch ever sees a complete chunk group,
    "chunk_reassembly_stream" -> envSql(
      """SELECT CAST("offset" AS VARCHAR) AS chunk_uuid, value AS payload
        |FROM envelope WHERE value IS NOT NULL AND "offset" < 100
        |ORDER BY chunk_uuid""".stripMargin),
    "crypto_roundtrip" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM envelope
        |WHERE value IS NOT NULL GROUP BY event_type ORDER BY event_type""".stripMargin),
    "backlog_quota" -> envSql(
      """SELECT partition, CAST(COUNT(*) AS BIGINT) AS backlog,
        |  MAX("offset") AS head, COUNT(*) > 1000 AS over_quota,
        |  CASE WHEN COUNT(*) > 1000 THEN MAX("offset") - 1000 END AS evict_to
        |FROM envelope GROUP BY partition ORDER BY partition""".stripMargin),
    "admin_skip" -> envSql(
      """SELECT partition, MAX("offset") AS new_cursor FROM (
        |  SELECT partition, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") AS rn
        |  FROM envelope) t WHERE rn <= 100
        |GROUP BY partition ORDER BY partition""".stripMargin),
    // Topics.getStats replay: storage octets (value+key), per-sub
    // backlog, and mark-delete derived the same sort-free way — highest
    // acked offset below the first unacked one
  )
}
