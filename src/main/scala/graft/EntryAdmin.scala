package graft

import graft.model.Envelope
import graft.operators.{AsOfJoin, Compaction, Dedup, Dispatch, Produce, Windows}
import graft.ext.{Graph, MinHash, TextOps, VectorOps}
import graft.functions.Murmur3Pulsar

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Admin/log/dispatch operators: topic stats and rates, topic-log manifest lifecycle, txn ack, key_shared assignment family, offload/retention/coalesce, connectors, reader/rate-limited dispatch.
  *
  * One domain slice of the driver-contract registry: `queries` holds
  * this domain's `SparkEntry.queries` entries, `oracleSql` the
  * matching DuckDB oracles; [[SparkEntry]] concatenates the slices.
  * Split from the former single-file registry for hygiene — no
  * behavior change, same 161 keys. Shared helpers and oracle CTE
  * fragments live in [[EntryShared]]. */
private[graft] object EntryAdmin {
  import EntryShared._

  /** Topic stats (reference Topics.getStats): per-partition storage
    * counters + per-subscription mark-delete/backlog over two
    * deterministic ack fixtures — subA acks every offset not divisible
    * by 3 (out-of-order, gaps), subB acks the even offsets. The oracle
    * replays both cursors and the octet accounting in SQL. */
  /** Deterministic ack fixtures shared by EVERY stats query (and
    * mirrored in the shared `statsOracleCte` SQL — keep both in sync):
    * subA acks every offset not divisible by 3 (out-of-order, gap at
    * 0), subB acks the even offsets (dense prefix). */
  private def statsAckSubs(e: DataFrame): Map[String, DataFrame] = {
    def acks(pred: Column) = e.filter(pred)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))
    Map("subA" -> acks(col(Envelope.Offset) % 3 =!= 0),
      "subB" -> acks(col(Envelope.Offset) % 2 === 0))
  }

  private def qTopicStats(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    graft.log.Admin.topicStats(e, statsAckSubs(e))
      .orderBy("subscription", "partition")
  }

  /** Composed admin LIFECYCLE (§2.3/2.9/2.14 seams together): produce
    * three quartile appends → OFFLOAD the log's offset-prefix to cold
    * storage (Admin.offload + vacuum of the hot originals) → trigger
    * compaction with the prefix already cold (the tiered scan: a
    * hot-only compactor would lose keys whose last write is cold) →
    * append the uncompacted tail → readCompacted over the
    * snapshot ∪ tiered tail → storage stats (the msg_count /
    * storage_bytes / head_offset / producers block of topicStats) on
    * the consumer view. This is the first row crossing the
    * offload↔compaction↔stats seams — where double-counted cold files
    * or a hot-only compaction scan would hide. The oracle replays the
    * mm3 routing, the horizon cut (offset order == (publish_time, seq)
    * order under single-month quartile appends), tombstone removal,
    * tail union, and octet accounting; tiering must be invisible in
    * every number. */
  private def qLifecycleComposed(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-lifecycle") { r =>
      val tl0 = new graft.log.TopicLog(s, r, name, 4)
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      val months = e.select(countDistinct(
        date_format(col(Envelope.PublishTime), "yyyy-MM"))).head().getLong(0)
      require(months == 1L,
        s"lifecycle fixture spans $months months — quartile cuts only " +
          "align offset order with (publish_time, seq) inside one month")
      // (publish_time, seq) is the offset-assignment order AND the
      // oracle's only handle on offset ranks — ties would make the
      // compaction winner (whose VALUE feeds storage_bytes) ambiguous
      val ties = e.groupBy(col(Envelope.PublishTime), col(Envelope.SequenceId))
        .count().filter(col("count") > 1).limit(1).count()
      require(ties == 0L,
        "lifecycle fixture has (publish_time, seq) ties — offset order " +
          "is ambiguous; redesign the cuts before trusting this oracle")
      val day = dayofmonth(col(Envelope.PublishTime))
      Seq(day <= 8, day > 8 && day <= 15, day > 15 && day <= 23)
        .foreach(p => tl0.append(e.filter(p)): Unit)
      val mid = tl0.read().agg(max(Envelope.Offset)).head().getLong(0) / 2
      require(graft.log.Admin.offload(tl0, beforeOffset = mid) > 0,
        "lifecycle fixture is VACUOUS: offload moved nothing")
      val horizon = Compaction.triggerCompaction(tl0)
      require(horizon.nonEmpty, "lifecycle fixture: no compaction horizon")
      tl0.append(e.filter(day > 23)): Unit
      val tailParts = tl0.read().filter(horizon.map { case (p, o) =>
          (col(Envelope.Partition) === p) && (col(Envelope.Offset) > o)
        }.reduce(_ || _)).select(Envelope.Partition).distinct().count()
      require(tailParts == 4,
        s"lifecycle fixture: tail rows in only $tailParts/4 partitions — " +
          "the head_offset oracle needs a tail in every partition")
      tl0.vacuum(): Unit // collect offloaded hot originals
    }
    val tl = new graft.log.TopicLog(s, root, name, 4)
    Compaction.readCompactedTopic(tl)
      .groupBy(col(Envelope.Partition).as("partition"))
      .agg(count(lit(1)).cast("bigint").as("msg_count"),
        countDistinct(col(Envelope.Key)).cast("bigint").as("n_keys"),
        sum(graft.log.Admin.payloadOctets).cast("bigint").as("storage_bytes"),
        countDistinct(col(Envelope.ProducerName)).cast("bigint").as("producers"),
        max(col(Envelope.Offset)).as("head_offset"))
      .orderBy("partition")
  }

  /** Topic throughput counters per hour (the msgRate/msgThroughput
    * surface of TopicStats as windowed counts). */
  private def qTopicRates(s: SparkSession, dir: String): DataFrame =
    graft.log.Admin.topicRates(env(s, dir), "1 hour")
      .select(col("partition"),
        date_format(col("bucket_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("msgs"), col("bytes"))
      .orderBy("partition", "hour")

  /** Partitioned-topic stats rollup (Topics.getPartitionedStats,
    * perPartition=false): counters summed across partitions per
    * subscription, over the same ack fixtures as topic_stats. */
  private def qTopicStatsPartitioned(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    graft.log.Admin.partitionedStats(
        graft.log.Admin.topicStats(e, statsAckSubs(e)))
      .orderBy("subscription")
  }

  /** Per-partition storage counters on the STREAMING path: the live
    * stats a dashboard tails, as a complete-mode aggregation over
    * readStream — converges to the batch per-partition truth. */
  private def qTopicStatsStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s, Envelope.fromEventsStream(s, dir)
        .groupBy(col(Envelope.Partition).as("partition"))
        .agg(count(lit(1)).cast("bigint").as("msg_count"),
          sum(graft.log.Admin.payloadOctets).cast("bigint").as("storage_bytes")))
      .orderBy("partition")

  /** §2.4 distinct aggregation: exact count-distinct users per type. */
  private def qCountDistinct(s: SparkSession, dir: String): DataFrame =
    env(s, dir).groupBy("event_type")
      .agg(countDistinct(Envelope.Key).cast("bigint").as("n_users"),
        count(lit(1)).cast("bigint").as("n_events"))
      .orderBy("event_type")

  /** §2.1 produce path end-to-end: route + append into a real topic log,
    * read back (murmur3 routing — rows-only oracle). */
  /** The shared built-once topic-log fixture (`q-log`): the envelope
    * appended through the real produce path. Every query that reads it
    * MUST build it through here — the fixture cache keys on the NAME,
    * so a second inline builder with a drifted recipe would silently
    * win or lose depending on run order. */
  private def qLogFixture(s: SparkSession, dir: String): graft.log.TopicLog = {
    val root = Fixtures.dir(s, dir, "q-log") { r =>
      val tl0 = new graft.log.TopicLog(s, r,
        graft.model.TopicName.parse("persistent://public/default/events"), 4)
      tl0.append(env(s, dir).drop(Envelope.Topic, Envelope.Partition))
    }
    new graft.log.TopicLog(s, root,
      graft.model.TopicName.parse("persistent://public/default/events"), 4)
  }

  private def qTopicLogRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tl = qLogFixture(s, dir)
    tl.read().groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.3/§4 manifest-history pruning on the oracle surface: six
    * appends build six manifest epochs, then the janitor prunes to the
    * newest two — and the read must stay byte-identical to the
    * full-envelope roundtrip (per-partition counts + dense offsets),
    * proving pruned history is never on the read path. A prune that
    * touched the latest manifest, a referenced data file, or the
    * high-water lines would shift counts or offsets and hash-mismatch. */
  private def qManifestPrune(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-prune") { r =>
      val tl = new graft.log.TopicLog(s, r, name, 4)
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      (0 until 6).foreach(i =>
        tl.append(e.filter(col(Envelope.Offset) % 6 === i)): Unit)
      require(tl.pruneManifests(keepLast = 2) > 0,
        "the prune must actually drop manifest history")
    }
    new graft.log.TopicLog(s, root, name, 4)
      .read().groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** Shadow-topic read view (reference ShadowReplicator.java): the
    * shadow shares the source log's committed storage, relabels the
    * topic name, and is read-only — so its per-partition truth is
    * exactly topic_log_roundtrip's with the shadow topic name attached;
    * any divergence means the shadow view dropped or duplicated rows. */
  private def qShadowRead(s: SparkSession, dir: String): DataFrame = {
    val shadow = new graft.log.ShadowTopic(qLogFixture(s, dir),
      graft.model.TopicName.parse("persistent://public/default/events-shadow"))
    shadow.read().groupBy(col(Envelope.Topic).as("topic"), col(Envelope.Partition))
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.10/§4 dispatch rate limiting on the STREAMING path (VERDICT r7
    * #4 wiring): the committed topic log consumed through
    * [[graft.streaming.Subscription.consumeRateLimited]] — every
    * microbatch is admitted against the token bucket before dispatch —
    * and re-aggregated to the per-partition produce-roundtrip truth.
    * The throttle must be RESULT-NEUTRAL: a dropped or double-dispatched
    * batch breaks the same oracle as topic_log_roundtrip. Rate/burst are
    * set so the fixture takes a few admission waits (the loop really
    * throttles) without inflating the bench. */
  private def qDispatchRateStream(s: SparkSession, dir: String): DataFrame =
    rateLimitedRoundtrip(s, dir, "rate-sub")((sub, handler) =>
      sub.consumeRateLimited(rateMsgsPerSec = rateForScale(s, dir),
        burst = 2000L)(handler))

  /** Scale-invariant throttle rate: rows/rate — the configured wait
    * FLOOR — is semantics, not machinery; at a fixed 100k msg/s a 10×
    * fixture spends 10× wall purely WAITING, which measures the config
    * rather than the bucket. Keying the rate to the fixture row count
    * (min 100k, so the driver-scale fixtures are unchanged) pins the
    * floor at ~1 s at every scale while the 2000-token burst still
    * forces real admission waits on every trigger. */
  // WeakHashMap on the session: a strong (session, dir) key would pin
  // every stopped SparkSession for the JVM's lifetime
  private val rateCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Double]]()

  private def rateForScale(s: SparkSession, dir: String): Double = {
    // cached per (session, fixture): the count is a metadata job, but an
    // extra Spark job inside every TIMED bench rep of both rate twins
    // would re-contaminate the measurement the scaling exists to clean
    val perSession = rateCache.synchronized {
      var m = rateCache.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Double]()
        rateCache.put(s, m): Unit
      }
      m
    }
    perSession.computeIfAbsent(dir, _ =>
      math.max(100000.0,
        s.read.parquet(s"$dir/events.parquet").count().toDouble))
  }

  /** Shared harness for the two rate-limited consume twins: same
    * fixture, fresh per-invocation checkpoint (registered with the
    * shutdown sweep so bench reps don't accumulate cursor dirs), same
    * per-batch metering and the same produce-roundtrip re-aggregation —
    * only the admission discipline differs. */
  private def rateLimitedRoundtrip(s: SparkSession, dir: String, subName: String)(
      start: (graft.streaming.Subscription, (DataFrame, Long) => Unit)
        => org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    val tl = qLogFixture(s, dir)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rate-ckpt")
    streamOutRoots.add(ckpt)
    val sub = new graft.streaming.Subscription(tl, subName,
      graft.streaming.SubscriptionType.Exclusive, ckpt.toString,
      policy = graft.streaming.BatchReceivePolicy(maxFilesPerTrigger = Some(8)))
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    val q = start(sub, { (batch, _) =>
      batch.groupBy(col(Envelope.Partition))
        .agg(count(lit(1)).as("n"), max(Envelope.Offset).as("mx"))
        .collect().foreach(r => acc.add((r.getInt(0), r.getLong(1), r.getLong(2)))): Unit
    })
    try q.processAllAvailable() finally q.stop()
    import scala.collection.JavaConverters._
    import s.implicits._
    acc.iterator().asScala.toSeq.toDF("partition", "pn", "pmx")
      .groupBy("partition")
      .agg(sum("pn").cast("bigint").as("n"), max("pmx").as("max_offset"))
      .orderBy("partition")
  }

  /** [[qDispatchRateStream]]'s twin under the reference-exact
    * dispatch-then-debt discipline
    * ([[graft.streaming.Subscription.consumeRateLimitedDebt]];
    * AsyncTokenBucket's consume-unconditionally-then-pause flow): the
    * batch dispatches first and the bucket balance may go negative —
    * result-neutrality against the same produce-roundtrip truth proves
    * the debt pauses reorder NOTHING and drop NOTHING, they only time
    * the triggers. */
  private def qDispatchRateDebtStream(s: SparkSession, dir: String): DataFrame =
    rateLimitedRoundtrip(s, dir, "rate-debt-sub")((sub, handler) =>
      sub.consumeRateLimitedDebt(msgs = Some((rateForScale(s, dir), 2000L)),
        bytes = None)(handler))

  /** Chunking × dedup composition (reference
    * MessageChunkingDeduplicationTest; VERDICT r7 #7): documents are
    * chunk-split (one sequence id per LOGICAL message), the arrival
    * stream injects a mid-stream retransmit of chunk 1 (doc_id%7=0), a
    * full same-sequence resend (doc_id%11=0), and a lost final chunk
    * (doc_id%13=5 when no resend refills it). Two refill paths are part
    * of the truth: the %11 resend always refills, and the %7 chunk-1
    * retransmit refills exactly the 2-chunk documents (their final
    * chunk IS chunk 1) — the oracle's closed form carries both. Then
    * chunk-aware dedup + reassembly run. Correctness is BYTE IDENTITY: every surviving message must
    * reassemble to exactly the original text (md5 + length), and lost
    * messages must not surface — double-counted or dropped chunks break
    * the hash. The oracle never replays the pipeline; original text IS
    * the truth. */
  private def qChunkDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Chunking, Dedup}
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)
    val chunks = Chunking.split(docs, "text", 64, Seq("doc_id"))
      .withColumn(Envelope.ProducerName, concat(lit("p"), col("doc_id") % 3))
      .withColumn(Envelope.SequenceId, col("doc_id"))
    val dupChunk = chunks.filter(col("doc_id") % 7 === 0 && col("chunk_id") === 1)
    val resend = chunks.filter(col("doc_id") % 11 === 0)
    val lostLast = col("doc_id") % 13 === 5 && col("doc_id") % 11 =!= 0 &&
      col("chunk_id") === col("num_chunks") - 1 && col("num_chunks") > 1
    val arrivals = chunks.withColumn("attempt", lit(0)).filter(!lostLast)
      .unionByName(dupChunk.withColumn("attempt", lit(1)))
      .unionByName(resend.withColumn("attempt", lit(2)))
    // broker arrival order per producer: retransmits land mid-stream
    // (right after the chunk they duplicate) — the harder dedup case
    val w = Window.partitionBy(Envelope.ProducerName)
      .orderBy(col(Envelope.SequenceId), col("chunk_id"), col("attempt"))
    val withOffsets = arrivals
      .withColumn(Envelope.Offset, row_number().over(w).cast("long"))
    Chunking.reassemble(Dedup.dedupChunked(withOffsets))
      .select(col("chunk_uuid").cast("bigint").as("doc_id"),
        md5(col("payload")).as("payload_md5"),
        length(col("payload")).cast("bigint").as("payload_len"))
      .orderBy("doc_id")
  }

  /** §2.12 transactional acknowledgment (reference Transaction.java:30-93
    * via PendingAckHandleImpl): ONE txn acks a deterministic slice of the
    * input topic AND produces a derived batch to the output topic through
    * the same commit marker. The oracle rebuilds both legs in SQL: the
    * cursor (markDelete = largest dense acked prefix per partition), the
    * remaining backlog, and the output topic's per-partition counts —
    * a partial commit (ack without produce or vice versa) breaks the
    * hash match. Built once, cached (`q-txn-ack`). */
  private def qTxnAckFixture(s: SparkSession, dir: String)
      : (graft.log.TopicLog, graft.log.AckLog, graft.log.TopicLog) = {
    val inName = graft.model.TopicName.parse("persistent://public/default/txn-events")
    val outName = graft.model.TopicName.parse("persistent://public/default/txn-out")
    val root = Fixtures.dir(s, dir, "q-txn-ack") { r =>
      val in = new graft.log.TopicLog(s, r, inName, 4)
      val out = new graft.log.TopicLog(s, r, outName, 4)
      in.append(env(s, dir).drop(Envelope.Topic, Envelope.Partition))
      val acks = new graft.log.AckLog(s, in.name.path(r), "sub-a")
      // ack set defined purely on offset values (deterministic regardless
      // of offset-assignment tie-breaks): the 0..10 prefix + every 3rd
      val toAck = in.read()
        .filter(col(Envelope.Offset) <= 10 || col(Envelope.Offset) % 3 === 0)
        .select(col(Envelope.Partition).as("partition"),
          col(Envelope.Offset).as("offset"))
      // output selected pre-routing by a deterministic envelope column
      val outBatch = env(s, dir).filter(col(Envelope.SequenceId) % 5 === 0)
        .drop(Envelope.Topic, Envelope.Partition)
      graft.log.Txn.begin(r).produce(out, outBatch).ack(acks, toAck).commit()
    }
    val in = new graft.log.TopicLog(s, root, inName, 4)
    (in, new graft.log.AckLog(s, in.name.path(root), "sub-a"),
      new graft.log.TopicLog(s, root, outName, 4))
  }

  private def qTxnAck(s: SparkSession, dir: String): DataFrame = {
    val (in, acks, out) = qTxnAckFixture(s, dir)
    val md = graft.streaming.AckState.markDeletePosition(acks.read())
    val bl = graft.streaming.AckState.backlog(in.read(), acks.read())
    val outAgg = out.read()
      .groupBy(col(Envelope.Partition).as("partition"))
      .agg(count(lit(1)).cast("bigint").as("out_n"),
        max(Envelope.Offset).as("out_max_offset"))
    md.join(bl, Seq("partition")).join(outAgg, Seq("partition"))
      .orderBy("partition")
  }

  /** Ack-log compaction is ANSWER-PRESERVING (ManagedCursorImpl
    * semantics: cursor = markDeletePosition + individual acks above it,
    * history forgotten): the txn_ack fixture recipe replayed in its own
    * root, then `AckLog.compact()` folds the dense acked prefix into
    * the cursor floor and deletes its rows — and the floor-aware
    * accessors must still produce EXACTLY the txn_ack truth (same
    * oracle SQL). A compaction that loses an ack, resurrects one, or
    * mis-seats the floor breaks the hash. */
  private def qAckCompaction(s: SparkSession, dir: String): DataFrame = {
    val inName = graft.model.TopicName.parse("persistent://public/default/txnc-events")
    val outName = graft.model.TopicName.parse("persistent://public/default/txnc-out")
    val root = Fixtures.dir(s, dir, "q-ack-compaction") { r =>
      val in = new graft.log.TopicLog(s, r, inName, 4)
      val out = new graft.log.TopicLog(s, r, outName, 4)
      in.append(env(s, dir).drop(Envelope.Topic, Envelope.Partition))
      val acks = new graft.log.AckLog(s, in.name.path(r), "sub-a")
      val toAck = in.read()
        .filter(col(Envelope.Offset) <= 10 || col(Envelope.Offset) % 3 === 0)
        .select(col(Envelope.Partition).as("partition"),
          col(Envelope.Offset).as("offset"))
      val outBatch = env(s, dir).filter(col(Envelope.SequenceId) % 5 === 0)
        .drop(Envelope.Topic, Envelope.Partition)
      graft.log.Txn.begin(r).produce(out, outBatch).ack(acks, toAck).commit()
      acks.compact(): Unit
    }
    val in = new graft.log.TopicLog(s, root, inName, 4)
    val acks = new graft.log.AckLog(s, in.name.path(root), "sub-a")
    val out = new graft.log.TopicLog(s, root, outName, 4)
    val outAgg = out.read()
      .groupBy(col(Envelope.Partition).as("partition"))
      .agg(count(lit(1)).cast("bigint").as("out_n"),
        max(Envelope.Offset).as("out_max_offset"))
    acks.markDelete().join(acks.backlogAgainst(in.read()), Seq("partition"))
      .join(outAgg, Seq("partition"))
      .orderBy("partition")
  }

  /** §2.10 STICKY explicit hash ranges, oracle-checked — including the
    * reference behavior for slots OUTSIDE every range (no consumer:
    * NULL routing), exercised via a deliberate gap at 21846..29999. */
  private def qKeySharedSticky(s: SparkSession, dir: String): DataFrame =
    Dispatch.keySharedSticky(env(s, dir),
        Seq((0, 21845, "c1"), (30000, 52000, "c2"), (52001, 65535, "c3")))
      .groupBy("consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"),
        min("slot").cast("bigint").as("min_slot"),
        max("slot").cast("bigint").as("max_slot"))
      // NULLS FIRST explicitly on both sides: Spark defaults nulls first,
      // DuckDB nulls last — the gap group must sort identically
      .orderBy(col("consumer_id").asc_nulls_first)

  /** §2.10 Key_Shared membership change, fully oracle-checked: the
    * DuckDB side rebuilds BOTH consistent-hash rings in SQL (ring point
    * = mm3_8("c-i") % 65536, ceiling lookup with the engine's exact
    * (point, owner) tie-break and wrap-around) and reproduces every
    * row's before/after owner — hash collisions between ring points
    * included. Movement counts per (before → after) pair are the output,
    * so the minimal-movement property is itself oracle-verified. */
  private def qKeySharedRebalance(s: SparkSession, dir: String): DataFrame =
    Dispatch.keySharedRebalance(env(s, dir),
        oldConsumers = Seq("c1", "c2", "c3"),
        newConsumers = Seq("c1", "c2", "c3", "c4"))
      .groupBy("consumer_before", "consumer_after")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"))
      .orderBy("consumer_before", "consumer_after")

  /** [[qKeySharedRebalance]] with DRAIN CURSORS (DrainingHashesTracker;
    * VERDICT r8 #3 as an oracle row, complementing KeySharedDrainSpec):
    * rows of a moved slot at or below the per-partition drain cursor
    * (60% of max offset) stay with the OLD owner — in flight, still
    * draining — while rows above route to the NEW owner. The oracle
    * replays the consistent-hash ring (mm3 macros) AND the cursor
    * split, so a drain rule that leaks a row to the wrong side of the
    * handover breaks the hash. */
  private def qKeySharedDrain(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val cursors: Map[Int, Long] = e.groupBy(Envelope.Partition)
      .agg(expr(s"max(${Envelope.Offset}) * 3 div 5").as("md"))
      .collect() // bounded: one row per partition
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    Dispatch.keySharedRebalance(e,
        oldConsumers = Seq("c1", "c2", "c3"),
        newConsumers = Seq("c1", "c2", "c3", "c4"),
        drainedUpTo = cursors)
      .groupBy("moved", "consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy("moved", "consumer_id")
  }

  /** Snapshot coalesce end-to-end on the oracle surface: append through
    * the produce path, coalesce to one file per partition (manifest file
    * snapshot), vacuum the replaced files — and prove content identity:
    * the output (and oracle) is exactly topic_log_roundtrip's, so any
    * row lost or duplicated by the rewrite breaks the hash match. */
  private def qCoalesceRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = Fixtures.dir(s, dir, "q-coalesce") { r =>
      val tl0 = new graft.log.TopicLog(s, r,
        graft.model.TopicName.parse("persistent://public/default/events"), 4)
      tl0.append(env(s, dir).drop(Envelope.Topic, Envelope.Partition))
      graft.log.Admin.coalesceFiles(tl0, filesPerPartition = 1)
      tl0.vacuum()
    }
    val tl = new graft.log.TopicLog(s, root,
      graft.model.TopicName.parse("persistent://public/default/events"), 4)
    tl.read().groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.14 tiered-storage offload on the oracle surface (reference
    * LedgerOffloader.java:137/183 + transparent read-back): append
    * through the produce path, offload every file whose max offset sits
    * in the cold half, vacuum the hot originals, then read through
    * [[graft.log.Admin.readTiered]] (hot ∪ cold) — the output (and
    * oracle) is exactly topic_log_roundtrip's, so a row lost,
    * duplicated, or double-served at the hot/cold seam breaks the hash
    * match. */
  private def qOffloadRead(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-offload") { r =>
      val tl0 = new graft.log.TopicLog(s, r, name, 4)
      // four calendar-quartile appends (one append = one file per
      // partition with a contiguous offset range) — a single append
      // would leave ONE file per partition whose max offset exceeds any
      // mid cut, and offload would silently move nothing
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      val day = dayofmonth(col(Envelope.PublishTime))
      Seq(day <= 8, day > 8 && day <= 15, day > 15 && day <= 23, day > 23)
        .foreach(p => tl0.append(e.filter(p)): Unit)
      val mid = tl0.read().agg(max(Envelope.Offset)).head().getLong(0) / 2
      val moved = graft.log.Admin.offload(tl0, beforeOffset = mid)
      require(moved > 0,
        s"offload fixture is VACUOUS: no file's max offset <= $mid — " +
          "the row would test nothing; fix the batch layout")
      tl0.vacuum()
    }
    val tl = new graft.log.TopicLog(s, root, name, 4)
    graft.log.Admin.readTiered(tl)
      .groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.3 retention trim on the oracle surface (reference ledger trim:
    * a ledger is deleted only when ENTIRELY out of retention —
    * file-granular here): the four-quartile fixture trimmed at
    * now=Feb 1, retention=14 days deletes exactly the day≤8 and day≤15
    * files; the day 16-23 file SURVIVES WHOLE even though its Jan 16-17
    * rows are outside retention — the file-granularity semantics the
    * oracle replays (survivors = day>15 rows, min surviving offset =
    * the count of trimmed rows, max untouched). */
  private def qRetentionTrim(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-retention") { r =>
      val tl0 = new graft.log.TopicLog(s, r, name, 4)
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      val day = dayofmonth(col(Envelope.PublishTime))
      Seq(day <= 8, day > 8 && day <= 15, day > 15 && day <= 23, day > 23)
        .foreach(p => tl0.append(e.filter(p)): Unit)
      val trimmed = graft.log.Admin.retentionTrim(tl0,
        nowMs = java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime,
        retentionMs = 14L * 24 * 3600 * 1000)
      require(trimmed > 0, "retention fixture is VACUOUS: nothing trimmed")
    }
    val tl = new graft.log.TopicLog(s, root, name, 4)
    tl.read().groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        min(Envelope.Offset).as("min_offset"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** Rotating-file-sink roundtrip on the oracle surface (hdfs3/alluxio
    * connector path): append through the produce path, stream the
    * committed log through the rotating text sink (tmp-write → fsync →
    * atomic rename, offset-ranged names), read the files back with the
    * codegen'd inverse mapping and recount — output (and oracle) is
    * exactly topic_log_roundtrip's, so a record lost, duplicated or
    * mis-bounded by the file layer breaks the hash match. */
  private def qFileSinkRoundtrip(s: SparkSession, dir: String): DataFrame = {
    def cfg(r: String) = graft.sources.FileRotatingSink.Config(
      s"$r/out", "events", rotationRecords = 512)
    val root = Fixtures.dir(s, dir, "q-filesink") { r =>
      val tl = new graft.log.TopicLog(s, s"$r/log",
        graft.model.TopicName.parse("persistent://public/default/events"), 4)
      tl.append(env(s, dir).drop(Envelope.Topic, Envelope.Partition)): Unit
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$r/out")): Unit
      graft.sources.FileRotatingSink
        .topicToFileSink(tl, cfg(r), s"$r/ckpt").awaitTermination()
    }
    graft.sources.FileRotatingSink.readBack(s, cfg(root))
      .groupBy("partition")
      .agg(count(lit(1)).cast("bigint").as("n"), max("offset").as("max_offset"))
      .orderBy("partition")
  }

  /** Multimodal pipeline with REAL header decoding: spec-valid PNG/JPEG/
    * GIF/WAV fixture bytes are synthesized per doc_id, then parsed back
    * by the container-header codecs and fed through the resize planner.
    * The oracle recomputes the fixture formulas in SQL, so a hash match
    * proves the parsers recover the true dimensions/channels/duration
    * from the bytes on every row. */
  private def qMultimodal(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select("doc_id")
    val media = ext.Multimodal.synthesizeMedia(docs, "doc_id")
    val meta = ext.Multimodal.withDecodedMeta(media, "payload")
    ext.Multimodal.withResizeTarget(meta, maxSide = 256)
      .select(col("doc_id"), col("media_meta.format").as("format"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"),
        col("media_meta.n_channels").as("n_channels"),
        col("media_meta.duration_ms").as("duration_ms"),
        col("target_width"))
      .orderBy("doc_id")
  }

  /** REAL pixel decode, oracle-checked (round 17, the carry-over
    * stretch item): per doc a fully-ENCODED solid-gray PNG (ImageIO's
    * real PNG writer; width/height/gray fixed arithmetic on doc_id) is
    * decoded back through [[ext.Multimodal.ImageIODecoder]] — the JDK's
    * actual inflate + defilter + color-resolve pixel path, behind the
    * pluggable [[ext.Multimodal.PixelDecoder]] seam — and the decoded
    * width/height/channels/mean-luma are aggregated. The DuckDB oracle
    * recomputes every value from doc_id arithmetic with no codec: any
    * drift in the pixel path (wrong defilter, wrong color model, wrong
    * luma fold) breaks the hash. Mean luma of a solid-gray image is the
    * gray level exactly; round() collapses the float fold. */
  private def qMediaPixels(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select("doc_id")
    val pngs = docs.withColumn("payload",
      ext.Multimodal.pngSynth(col("doc_id")))
    ext.Multimodal.withPixelStats(pngs, "payload")
      .groupBy((col("doc_id") % 16).cast("bigint").as("g"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("pixel_stats.width")).cast("bigint").as("sum_w"),
        sum(col("pixel_stats.height")).cast("bigint").as("sum_h"),
        sum(col("pixel_stats.n_channels")).cast("bigint").as("sum_ch"),
        sum(round(col("pixel_stats.mean_luma"))).cast("bigint").as("sum_luma"))
      .orderBy("g")
  }

  /** §2.10 Shared-subscription priority dispatch, oracle-checked: the
    * permit-cycle schedule (reference example order C1,C2,C3,C1,C4,C5,C4
    * for C1(p0,2) C2(p0,1) C3(p0,1) C4(p1,2) C5(p1,1)) is RECOMPUTED in
    * SQL from the (priority, permits) table — one row per permit ranked
    * by (priority, round, position) — and applied to the same
    * per-partition arrival ranks; per-consumer counts and offset spans
    * must agree exactly. */
  private def qSharedPriority(s: SparkSession, dir: String): DataFrame =
    Dispatch.sharedPriorityDispatch(env(s, dir),
        Seq(("c1", 0, 2), ("c2", 0, 1), ("c3", 0, 1), ("c4", 1, 2), ("c5", 1, 1)))
      .groupBy("consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        min(Envelope.Offset).as("min_offset"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy("consumer_id")

  /** Video/audio frame sampling, oracle-checked: one row per sampled
    * frame index (every 700 ms of decoded duration; images contribute
    * their single frame at 0). The oracle inverts the fixture duration
    * formulas and counts arithmetic frames — dur//step + 1 — so the
    * hash match pins the explode(sequence(...)) fencepost behavior. */
  private def qFrameSample(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select("doc_id")
    val media = ext.Multimodal.synthesizeMedia(docs, "doc_id")
    val meta = ext.Multimodal.withDecodedMeta(media, "payload")
    ext.Multimodal.sampleFrames(meta, everyMs = 700L)
      .groupBy(col("doc_id"), col("media_meta.format").as("format"))
      .agg(count(lit(1)).cast("bigint").as("n_frames"),
        max("frame_ms").as("last_frame_ms"))
      .orderBy("doc_id")
  }

  /** CDC apply (reference pulsar-io/debezium), oracle-checked end to end:
    * the query BUILDS real Debezium-shaped change envelopes from the
    * fixture (op = d for tombstones, c/u by offset parity; after = the
    * original payload, JSON-escaped by to_json), then materializes table
    * state with [[Connectors.cdcApply]] — per key the highest offset
    * wins, deletes remove the key, `after` round-trips the escape. The
    * oracle recomputes the surviving state from the base columns alone
    * (never parsing JSON), so a hash match proves the escape/parse
    * round-trip AND the apply semantics. */
  private def qCdcApply(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val cdc = e
      .withColumn("_op",
        when(col(Envelope.Value).isNull, lit("d"))
          .otherwise(when(col(Envelope.Offset) % 3 === 0, lit("c"))
            .otherwise(lit("u"))))
      .withColumn(Envelope.Value,
        to_json(struct(col("_op").as("op"), col(Envelope.Value).as("after"))))
    graft.sources.Connectors.cdcApply(cdc)
      .select(col(Envelope.Key).as("key"), col("op"),
        col("as_of_offset"), col("after"))
      .orderBy("key")
  }

  /** Canal binlog CDC apply with position-watermark resume: the envelope
    * becomes a position-stamped change stream (file = offset div 300,
    * pos within file — bijective with offset, so binlog order IS commit
    * order), a fixed resume watermark (mysql-bin.000001, 600) drops the
    * already-acked prefix, and last-writer-wins per pk materializes the
    * table. The oracle replays the identical file/pos arithmetic,
    * watermark filter and DELETE handling in SQL. */
  private def qCanalApply(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val changes = e.select(
      col(Envelope.Key).as("pk"),
      concat(lit("mysql-bin."),
        lpad((col(Envelope.Offset) / 300).cast("int").cast("string"), 6, "0"))
        .as("binlog_file"),
      ((col(Envelope.Offset) % 300) * 4 + 4).cast("bigint").as("binlog_pos"),
      when(col(Envelope.Value).isNull, lit("DELETE"))
        .otherwise(when(col(Envelope.Offset) % 3 === 0, lit("INSERT"))
          .otherwise(lit("UPDATE"))).as("change_type"),
      col(Envelope.Value).as("data"))
    graft.sources.Connectors.canalApply(changes,
        resumeFile = "mysql-bin.000001", resumePos = 600L)
      .orderBy("pk")
  }

  /** §2.10 Failover dispatch, oracle-checked: only the HIGHEST-priority
    * tier serves (lower level = higher priority), partitions spread over
    * the tier in lexicographic name order (ConsumerBuilder.java:551-569).
    * The oracle recomputes the tier + spread from the same (name,
    * priority) table in SQL; the standby must appear in NEITHER result. */
  private def qFailover(s: SparkSession, dir: String): DataFrame =
    Dispatch.failoverActiveConsumer(env(s, dir),
        Seq(("standby", 5), ("b", 0), ("a", 0)))
      .groupBy("consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Partition).cast("bigint").as("n_partitions"),
        min(Envelope.Offset).as("min_offset"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy("consumer_id")

  /** §2.10 AUTO_SPLIT fixed-hash-range assignment, oracle-checked: the
    * oracle's slot boundaries (16384/32768/49152) are hand-derived from
    * the reference algorithm — join order c1..c4 splits biggest-range-
    * in-half with the joiner taking the lower half, giving layout
    * c3, c2, c4, c1 — NOT an even split by index. The engine must
    * reproduce that exact ownership from its own simulation. */
  private def qKeySharedAutoSplit(s: SparkSession, dir: String): DataFrame =
    Dispatch.keySharedAutoSplit(env(s, dir), Seq("c1", "c2", "c3", "c4"))
      .groupBy("consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"),
        min("slot").cast("bigint").as("min_slot"),
        max("slot").cast("bigint").as("max_slot"))
      .orderBy("consumer_id")

  /** §2.2 producer batch assembly (batchingMaxMessages=100): per
    * partition, offset-ordered rows pack into batches; output is
    * per-batch stats + the top batch_index, which must always be
    * n−1 — the coordinates the batch-index ack machinery addresses. */
  private def qProducerBatches(s: SparkSession, dir: String): DataFrame =
    Produce.assignBatches(env(s, dir), maxMessages = 100)
      .groupBy(col(Envelope.Partition), col("batch_seq"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        min(Envelope.Offset).as("min_offset"),
        max(Envelope.Offset).as("max_offset"),
        max(Envelope.BatchIndex).cast("int").as("top_batch_index"))
      .orderBy(Envelope.Partition, "batch_seq")

  /** §2.10 Key_Shared hash parity, oracle-checked: the DuckDB side
    * reimplements murmur3_32 in pure SQL (overflow-safe 32-bit arithmetic
    * macros), so the slot of every key — and thus the whole ring
    * assignment — hash-matches the engine's Catalyst pulsar_hash. */
  private def qKeySharedOracle(s: SparkSession, dir: String): DataFrame =
    Dispatch.keySharedAssign(env(s, dir), 4)
      .groupBy("consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"),
        min("slot").cast("bigint").as("min_slot"),
        max("slot").cast("bigint").as("max_slot"))
      .orderBy("consumer_id")

  /** §2.10 hash parity across EVERY supported key width: each distinct
    * (key, event_type) pair spawns prefixes of length 1–15 of a padded
    * compound key, hashing all seven murmur3 length regimes (tail-only,
    * 1/2/3 body rounds, each ± tail) through the Catalyst kernel; the
    * oracle recomputes them with the staged mm3_8 macros. This is what
    * future-proofs every key-routed oracle past 7-byte keys (sf>1 key
    * widths). */
  private def qHashWide(s: SparkSession, dir: String): DataFrame = {
    val base = concat(col("key"), lit("#"), col("event_type"),
      lit("~abcdefghijklmnop"))
    env(s, dir).select(col(Envelope.Key).as("key"), col("event_type")).distinct()
      .select(col("key"), col("event_type"),
        explode(sequence(lit(1), lit(15))).as("n"))
      .select(col("key"), col("event_type"), col("n").cast("bigint").as("n"),
        base.substr(lit(1), col("n")).as("wk"))
      .withColumn("h", Murmur3Pulsar.pulsar_hash(col("wk")).cast("bigint"))
      .orderBy("key", "event_type", "n")
  }

  // =====================================================================
  // LLM-pipeline extension operators (BASELINE.json north star)
  // =====================================================================

  /** §2.1 Reader — the non-durable positioned scan (reference
    * Reader.java:49 / ConsumerImpl in reader mode): every partition read
    * from offset 100 to its head, no cursor created. The oracle replays
    * the dense-offset arithmetic (count − 100 rows, first = 100,
    * max = count − 1) over the murmur3-routed envelope. */
  private def qReaderScan(s: SparkSession, dir: String): DataFrame = {
    val tl = qLogFixture(s, dir)
    (0 until 4).map(p => tl.readFrom(p, 100L))
      .reduce(_.unionByName(_))
      .groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        min(Envelope.Offset).as("first_offset"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "keyshared_rebalance" -> (qKeySharedRebalance _),
    "keyshared_drain" -> (qKeySharedDrain _),
    "offload_read" -> (qOffloadRead _),
    "retention_trim" -> (qRetentionTrim _),
    "keyshared_sticky" -> (qKeySharedSticky _),
    "keyshared_hash_oracle" -> (qKeySharedOracle _),
    "hash_wide" -> (qHashWide _),
    "shared_priority" -> (qSharedPriority _),
    "failover_assign" -> (qFailover _),
    "cdc_apply" -> (qCdcApply _),
    "canal_apply" -> (qCanalApply _),
    "frame_sample" -> (qFrameSample _),
    "producer_batches" -> (qProducerBatches _),
    "keyshared_autosplit" -> (qKeySharedAutoSplit _),
    "topic_stats" -> (qTopicStats _),
    "lifecycle_composed" -> (qLifecycleComposed _),
    "topic_rates" -> (qTopicRates _),
    "topic_stats_partitioned" -> (qTopicStatsPartitioned _),
    "topic_stats_stream" -> (qTopicStatsStream _),
    "q_count_distinct" -> (qCountDistinct _),
    "topic_log_roundtrip" -> (qTopicLogRoundtrip _),
    "manifest_prune" -> (qManifestPrune _),
    "txn_ack" -> (qTxnAck _),
    "reader_scan" -> (qReaderScan _),
    "chunk_dedup" -> (qChunkDedup _),
    "dispatch_rate_stream" -> (qDispatchRateStream _),
    "dispatch_rate_debt_stream" -> (qDispatchRateDebtStream _),
    "ack_compaction" -> (qAckCompaction _),
    "shadow_read" -> (qShadowRead _),
    "coalesce_roundtrip" -> (qCoalesceRoundtrip _),
    "file_sink_roundtrip" -> (qFileSinkRoundtrip _),
    "datagen_persons" -> ((s: SparkSession, _: String) =>
      graft.sources.DataGeneratorSource.persons(s, 1000, "dg").orderBy("person_id")),
    "multimodal_pipeline" -> (qMultimodal _),
    "media_pixels" -> (qMediaPixels _)
  )

  def oracleSql: Map[String, String] = Map(
    "lifecycle_composed" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), r AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE props END AS value,
        |    'p' || CAST(user_id % 4 AS VARCHAR) AS producer_name,
        |    ts AS pt,
        |    CASE WHEN event_id % 10 = 0 THEN event_id - 1 ELSE event_id END AS seq,
        |    date_part('day', ts) AS d,
        |    CAST(mm3_8(CAST(user_id AS VARCHAR)) % 4 AS INT) AS partition
        |  FROM ev
        |), snap AS (
        |  SELECT key, partition, value, producer_name FROM (
        |    SELECT key, partition, value, producer_name,
        |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY pt DESC, seq DESC) AS rn
        |    FROM r WHERE d <= 23) t
        |  WHERE rn = 1 AND value IS NOT NULL
        |), tl AS (SELECT key, partition, value, producer_name FROM r WHERE d > 23),
        |uni AS (SELECT * FROM snap UNION ALL SELECT * FROM tl),
        |tot AS (SELECT partition, COUNT(*) AS total FROM r GROUP BY partition)
        |SELECT u.partition, CAST(COUNT(*) AS BIGINT) AS msg_count,
        |  CAST(COUNT(DISTINCT u.key) AS BIGINT) AS n_keys,
        |  CAST(SUM(COALESCE(octet_length(CAST(u.value AS BLOB)), 0) +
        |    COALESCE(octet_length(CAST(u.key AS BLOB)), 0)) AS BIGINT) AS storage_bytes,
        |  CAST(COUNT(DISTINCT u.producer_name) AS BIGINT) AS producers,
        |  CAST(t.total - 1 AS BIGINT) AS head_offset
        |FROM uni u JOIN tot t ON u.partition = t.partition
        |GROUP BY u.partition, t.total ORDER BY u.partition""".stripMargin),
    "keyshared_rebalance" -> (mm3Macros +
      """CREATE OR REPLACE TEMP TABLE graft_ring_old AS
        |  SELECT mm3_8(c || '-' || CAST(i AS VARCHAR)) % 65536 AS point, c AS owner
        |  FROM (SELECT unnest(['c1','c2','c3']) AS c) cs CROSS JOIN range(0, 100) t(i);
        |CREATE OR REPLACE TEMP TABLE graft_ring_new AS
        |  SELECT mm3_8(c || '-' || CAST(i AS VARCHAR)) % 65536 AS point, c AS owner
        |  FROM (SELECT unnest(['c1','c2','c3','c4']) AS c) cs CROSS JOIN range(0, 100) t(i);
        |WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), slots AS (
        |  SELECT key, mm3_8(key) % 65536 AS slot FROM envelope
        |), uniq AS (SELECT DISTINCT key, slot FROM slots
        |), a_old AS (
        |  SELECT key, owner AS consumer_before FROM (
        |    SELECT u.key, r.owner,
        |      ROW_NUMBER() OVER (PARTITION BY u.key ORDER BY (r.point < u.slot), r.point, r.owner) AS rn
        |    FROM uniq u CROSS JOIN graft_ring_old r) t WHERE rn = 1
        |), a_new AS (
        |  SELECT key, owner AS consumer_after FROM (
        |    SELECT u.key, r.owner,
        |      ROW_NUMBER() OVER (PARTITION BY u.key ORDER BY (r.point < u.slot), r.point, r.owner) AS rn
        |    FROM uniq u CROSS JOIN graft_ring_new r) t WHERE rn = 1
        |), joined AS (
        |  SELECT s.key, consumer_before, consumer_after
        |  FROM slots s JOIN a_old USING (key) JOIN a_new USING (key))
        |SELECT consumer_before, consumer_after, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys
        |FROM joined GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // rebalance + drain cursors: ring ownership replayed as above, then
    // a moved slot's rows split on the per-partition 60% cursor — at or
    // below stays with the old owner (still draining), above routes new,
    "keyshared_drain" -> (mm3Macros +
      """CREATE OR REPLACE TEMP TABLE graft_ring_old AS
        |  SELECT mm3_8(c || '-' || CAST(i AS VARCHAR)) % 65536 AS point, c AS owner
        |  FROM (SELECT unnest(['c1','c2','c3']) AS c) cs CROSS JOIN range(0, 100) t(i);
        |CREATE OR REPLACE TEMP TABLE graft_ring_new AS
        |  SELECT mm3_8(c || '-' || CAST(i AS VARCHAR)) % 65536 AS point, c AS owner
        |  FROM (SELECT unnest(['c1','c2','c3','c4']) AS c) cs CROSS JOIN range(0, 100) t(i);
        |WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(user_id % 4 AS INT) AS partition, event_id AS "offset"
        |  FROM ev
        |), cur AS (
        |  SELECT partition, (MAX("offset") * 3) // 5 AS md
        |  FROM envelope GROUP BY partition
        |), uniq AS (
        |  SELECT DISTINCT key, mm3_8(key) % 65536 AS slot FROM envelope
        |), a_old AS (
        |  SELECT key, owner AS consumer_before FROM (
        |    SELECT u.key, r.owner,
        |      ROW_NUMBER() OVER (PARTITION BY u.key ORDER BY (r.point < u.slot), r.point, r.owner) AS rn
        |    FROM uniq u CROSS JOIN graft_ring_old r) t WHERE rn = 1
        |), a_new AS (
        |  SELECT key, owner AS consumer_after FROM (
        |    SELECT u.key, r.owner,
        |      ROW_NUMBER() OVER (PARTITION BY u.key ORDER BY (r.point < u.slot), r.point, r.owner) AS rn
        |    FROM uniq u CROSS JOIN graft_ring_new r) t WHERE rn = 1
        |), eff AS (
        |  SELECT e.key, (consumer_before <> consumer_after) AS moved,
        |    CASE WHEN consumer_before <> consumer_after AND e."offset" <= c.md
        |      THEN consumer_before ELSE consumer_after END AS consumer_id,
        |    e."offset"
        |  FROM envelope e
        |  JOIN a_old USING (key) JOIN a_new USING (key)
        |  JOIN cur c ON e.partition = c.partition)
        |SELECT moved, consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
        |  MAX("offset") AS max_offset
        |FROM eff GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "offload_read" -> topicLogRoundtripSql,
    // file-granular retention: day>15 files survive whole; min surviving
    // offset = count of trimmed (day<=15) rows per partition,
    "retention_trim" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), routed AS (
        |  SELECT CAST(mm3_8(CAST(user_id AS VARCHAR)) % 4 AS INT) AS partition,
        |    date_part('day', ts) AS d
        |  FROM ev)
        |SELECT partition,
        |  CAST(SUM(CASE WHEN d > 15 THEN 1 ELSE 0 END) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN d <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS min_offset,
        |  CAST(COUNT(*) - 1 AS BIGINT) AS max_offset
        |FROM routed GROUP BY partition ORDER BY partition""".stripMargin),
    // the rate-limited dispatch loop must also be content-neutral: the
    // token bucket delays batches, never drops or replays them,
    "keyshared_sticky" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), slots AS (
        |  SELECT key, mm3_8(key) % 65536 AS slot FROM envelope
        |), assigned AS (
        |  SELECT key, slot,
        |    CASE WHEN slot BETWEEN 0 AND 21845 THEN 'c1'
        |         WHEN slot BETWEEN 30000 AND 52000 THEN 'c2'
        |         WHEN slot BETWEEN 52001 AND 65535 THEN 'c3'
        |    END AS consumer_id
        |  FROM slots)
        |SELECT consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
        |  MIN(slot) AS min_slot, MAX(slot) AS max_slot
        |FROM assigned GROUP BY consumer_id ORDER BY consumer_id NULLS FIRST""".stripMargin),
    // Boundaries hand-derived from the reference's split-biggest-in-half
    // algorithm for join order c1..c4 (HashRangeAutoSplitStickyKey
    // ConsumerSelector.java): c3 [0,16384], c2 (16384,32768],
    // c4 (32768,49152], c1 (49152,65535] — independent of the engine's
    // driver-side simulation, which must land on the same layout.,
    "keyshared_hash_oracle" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), slots AS (
        |  SELECT key, mm3_8(key) % 65536 AS slot,
        |    CAST(least((mm3_8(key) % 65536) // 16384, 3) AS INT) AS consumer_id
        |  FROM envelope)
        |SELECT consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
        |  MIN(slot) AS min_slot, MAX(slot) AS max_slot
        |FROM slots GROUP BY consumer_id ORDER BY consumer_id""".stripMargin),
    // every murmur3 length regime (0-3 tail-only, 4/8/12 pure rounds,
    // 5-7/9-11/13-15 rounds+tail) hashed by BOTH engines, bit-for-bit,
    "hash_wide" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), uniq AS (
        |  SELECT DISTINCT CAST(user_id AS VARCHAR) AS key, event_type FROM ev
        |), wide AS (
        |  SELECT key, event_type, CAST(n AS BIGINT) AS n,
        |    substr(key || '#' || event_type || '~abcdefghijklmnop', 1, CAST(n AS INT)) AS wk
        |  FROM uniq CROSS JOIN range(1, 16) t(n))
        |SELECT key, event_type, n, wk, CAST(mm3_8(wk) AS BIGINT) AS h
        |FROM wide ORDER BY key, event_type, n""".stripMargin),
    "shared_priority" -> envSql(
      """, sched AS (
        |  SELECT name, ROW_NUMBER() OVER (ORDER BY priority, r, pos) - 1 AS slot
        |  FROM (
        |    SELECT name, priority, pos, unnest(range(permits)) AS r
        |    FROM (VALUES ('c1',0,2,0),('c2',0,1,1),('c3',0,1,2),('c4',1,2,3),('c5',1,1,4))
        |      AS c(name, priority, permits, pos)) t),
        |rnk AS (
        |  SELECT "offset", partition,
        |    ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") - 1 AS rn
        |  FROM envelope)
        |SELECT s.name AS consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN("offset") AS min_offset, MAX("offset") AS max_offset
        |FROM rnk JOIN sched s ON s.slot = rnk.rn % (SELECT COUNT(*) FROM sched)
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    // frame census from the inverted fixture-duration formulas:
    // dur//step + 1 frames pins explode(sequence(0, dur, step)) fenceposts,
    "failover_assign" -> envSql(
      """, cons AS (
        |  SELECT * FROM (VALUES ('standby',5),('b',0),('a',0)) AS c(name, priority)),
        |tier AS (
        |  SELECT name, ROW_NUMBER() OVER (ORDER BY name) - 1 AS idx,
        |    COUNT(*) OVER () AS n_tier
        |  FROM cons WHERE priority = (SELECT MIN(priority) FROM cons))
        |SELECT t.name AS consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT e.partition) AS BIGINT) AS n_partitions,
        |  MIN(e."offset") AS min_offset, MAX(e."offset") AS max_offset
        |FROM envelope e JOIN tier t ON t.idx = e.partition % t.n_tier
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    "cdc_apply" -> envSql(
      """, latest AS (
        |  SELECT key, "offset", value,
        |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY "offset" DESC) AS rn
        |  FROM envelope)
        |SELECT key,
        |  CASE WHEN "offset" % 3 = 0 THEN 'c' ELSE 'u' END AS op,
        |  "offset" AS as_of_offset, value AS after
        |FROM latest WHERE rn = 1 AND value IS NOT NULL
        |ORDER BY key""".stripMargin),
    // canal FlatMessage apply: identical file/pos arithmetic, the resume
    // watermark drops the acked prefix, last write per pk wins, DELETE
    // removes — replayed entirely in SQL,
    "canal_apply" -> envSql(
      """, ch AS (
        |  SELECT key AS pk,
        |    'mysql-bin.' || lpad(CAST("offset" // 300 AS VARCHAR), 6, '0') AS binlog_file,
        |    CAST(("offset" % 300) * 4 + 4 AS BIGINT) AS binlog_pos,
        |    CASE WHEN value IS NULL THEN 'DELETE'
        |         WHEN "offset" % 3 = 0 THEN 'INSERT' ELSE 'UPDATE' END AS change_type,
        |    value AS data
        |  FROM envelope),
        |applied AS (
        |  SELECT * FROM ch
        |  WHERE binlog_file > 'mysql-bin.000001'
        |     OR (binlog_file = 'mysql-bin.000001' AND binlog_pos > 600)),
        |last AS (
        |  SELECT pk, change_type, data, binlog_file, binlog_pos,
        |    ROW_NUMBER() OVER (PARTITION BY pk
        |      ORDER BY binlog_file DESC, binlog_pos DESC) AS rn
        |  FROM applied)
        |SELECT pk, change_type, data, binlog_file, binlog_pos
        |FROM last WHERE rn = 1 AND change_type <> 'DELETE'
        |ORDER BY pk""".stripMargin),
    // active tier RECOMPUTED from the (name, priority) table: min
    // priority wins, lexicographic spread over partitions — the standby
    // consumer must appear in neither result,
    "frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id % 6 AS k,
        |    CAST(1 + (doc_id % 2) AS INT) AS wav_ch,
        |    8000 + (doc_id % 100) * 16 AS wav_data,
        |    list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
        |      CAST(1 + (doc_id % 14) AS INT)) AS kbps,
        |    2000 + (doc_id % 50) * 100 AS mp3_bytes,
        |    30000 + (doc_id % 100) * 500 AS mp4_dur
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    CASE k WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
        |           WHEN 3 THEN 'wav' WHEN 4 THEN 'mp3' ELSE 'mp4' END AS format,
        |    CASE WHEN k < 3 THEN 0
        |         WHEN k = 3 THEN (wav_data * 1000) // (8000 * wav_ch * 2)
        |         WHEN k = 4 THEN (mp3_bytes * 8) // kbps
        |         ELSE mp4_dur END AS dur
        |  FROM m)
        |SELECT doc_id, format,
        |  CAST(dur // 700 + 1 AS BIGINT) AS n_frames,
        |  CAST((dur // 700) * 700 AS BIGINT) AS last_frame_ms
        |FROM d ORDER BY doc_id""".stripMargin,
    // surviving CDC state recomputed from the BASE columns (no JSON on
    // the oracle side): latest offset per key wins, tombstones (null
    // value -> op 'd') drop the key, after = the original payload —
    // a hash match proves the Spark side's JSON escape/parse round-trip,
    "producer_batches" -> envSql(
      """, rnk AS (
        |  SELECT partition, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") - 1 AS rn
        |  FROM envelope)
        |SELECT partition, CAST(rn // 100 AS BIGINT) AS batch_seq,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN("offset") AS min_offset, MAX("offset") AS max_offset,
        |  CAST(MAX(rn % 100) AS INT) AS top_batch_index
        |FROM rnk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // schedule RECOMPUTED from the (priority, permits) table — one row
    // per permit ranked by (priority, round, list position); the engine's
    // driver-side cycle must agree slot-for-slot or counts/spans diverge,
    "keyshared_autosplit" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), slots AS (
        |  SELECT key, mm3_8(key) % 65536 AS slot FROM envelope
        |), assigned AS (
        |  SELECT key, slot,
        |    CASE WHEN slot <= 16384 THEN 'c3'
        |         WHEN slot <= 32768 THEN 'c2'
        |         WHEN slot <= 49152 THEN 'c4'
        |         ELSE 'c1'
        |    END AS consumer_id
        |  FROM slots)
        |SELECT consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
        |  MIN(slot) AS min_slot, MAX(slot) AS max_slot
        |FROM assigned GROUP BY consumer_id ORDER BY consumer_id""".stripMargin),
    // The rings are materialized as temp tables (separate statements):
    // the mm3_8 macro expands to a large expression tree, and three
    // evaluation regions in one pipeline exhaust DuckDB's per-thread
    // allocations at high thread counts.,
    "topic_stats" -> envSql(statsOracleCte +
      """
        |SELECT s.subscription, st.partition, st.msg_count, st.storage_bytes,
        |  round(CAST(st.storage_bytes AS DOUBLE) / st.msg_count, 6) AS avg_msg_size_r,
        |  st.head_offset, st.producers,
        |  COALESCE(md.mark_delete, -1) AS mark_delete,
        |  COALESCE(bl.backlog, 0) AS backlog
        |FROM store st CROSS JOIN subs s
        |LEFT JOIN bl ON bl.subscription = s.subscription AND bl.partition = st.partition
        |LEFT JOIN md ON md.subscription = s.subscription AND md.partition = st.partition
        |ORDER BY s.subscription, st.partition""".stripMargin),
    // windowed throughput counters: hour buckets of publish_time,
    "topic_rates" -> envSql(
      """SELECT partition,
        |  strftime(date_trunc('hour', publish_time), '%Y-%m-%d %H:%M:%S') AS hour,
        |  CAST(COUNT(*) AS BIGINT) AS msgs,
        |  CAST(SUM(COALESCE(octet_length(CAST(value AS BLOB)), 0) +
        |    COALESCE(octet_length(CAST(key AS BLOB)), 0)) AS BIGINT) AS bytes
        |FROM envelope GROUP BY 1, 2 ORDER BY partition, hour""".stripMargin),
    // getPartitionedStats rollup: counters summed across partitions,
    // SAME shared CTE block as topic_stats (fixture parity by construction),
    "topic_stats_partitioned" -> envSql(statsOracleCte +
      """
        |SELECT s.subscription,
        |  CAST(COUNT(*) AS BIGINT) AS partitions,
        |  CAST(SUM(st.msg_count) AS BIGINT) AS msg_count,
        |  CAST(SUM(st.storage_bytes) AS BIGINT) AS storage_bytes,
        |  CAST(SUM(COALESCE(bl.backlog, 0)) AS BIGINT) AS backlog
        |FROM store st CROSS JOIN subs s
        |LEFT JOIN bl ON bl.subscription = s.subscription AND bl.partition = st.partition
        |GROUP BY s.subscription ORDER BY s.subscription""".stripMargin),
    // the live per-partition counters converge to the batch truth,
    "topic_stats_stream" -> envSql(
      """SELECT partition, CAST(COUNT(*) AS BIGINT) AS msg_count,
        |  CAST(SUM(COALESCE(octet_length(CAST(value AS BLOB)), 0) +
        |    COALESCE(octet_length(CAST(key AS BLOB)), 0)) AS BIGINT) AS storage_bytes
        |FROM envelope GROUP BY partition ORDER BY partition""".stripMargin),
    "q_count_distinct" -> envSql(
      """SELECT event_type, CAST(COUNT(DISTINCT key) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM envelope GROUP BY event_type ORDER BY event_type""".stripMargin),
    // the estimate itself is engine-side-only; the oracle checks the exact
    // counts AND the in-query error-bound certificate (TRUE expected),
    "topic_log_roundtrip" -> topicLogRoundtripSql,
    // pruning manifest HISTORY must leave the read surface untouched —
    // identical counts and dense offsets to the un-pruned roundtrip,
    "manifest_prune" -> topicLogRoundtripSql,
    // both txn legs rebuilt in SQL: dense per-partition offsets via
    // ROW_NUMBER (ack membership depends only on offset VALUES, so
    // (publish_time, sequence_id) ties cannot diverge the set), cursor =
    // largest dense acked prefix, backlog = anti-join, output = the
    // sequence_id%5 slice re-routed by key hash,
    "txn_ack" -> txnAckSql,
    // compaction must not change any answer: same truth, computed
    // through the cursor floor + surviving individual acks,
    "reader_scan" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), keys AS (SELECT CAST(user_id AS VARCHAR) AS key FROM ev),
        |routed AS (SELECT CAST(mm3_8(key) % 4 AS INT) AS partition FROM keys),
        |counts AS (SELECT partition, COUNT(*) AS cnt FROM routed GROUP BY partition)
        |SELECT partition, CAST(cnt - 100 AS BIGINT) AS n,
        |  CAST(100 AS BIGINT) AS first_offset,
        |  CAST(cnt - 1 AS BIGINT) AS max_offset
        |FROM counts WHERE cnt > 100 ORDER BY partition""".stripMargin),
    "chunk_dedup" ->
      """SELECT doc_id, md5(text) AS payload_md5,
        |  CAST(length(text) AS BIGINT) AS payload_len
        |FROM documents
        |WHERE text IS NOT NULL
        |  AND NOT (doc_id % 13 = 5 AND doc_id % 11 <> 0 AND length(text) > 64
        |           AND NOT (doc_id % 7 = 0 AND length(text) <= 128))
        |ORDER BY doc_id""".stripMargin,
    // the shadow view is the same committed per-partition truth with the
    // shadow topic name relabeled,
    "dispatch_rate_stream" -> topicLogRoundtripSql,
    // the debt discipline must be result-neutral too — same truth,
    "dispatch_rate_debt_stream" -> topicLogRoundtripSql,
    // the rotating file sink (hdfs3/alluxio path) must also be
    // content-neutral: write → read-back → identical counts,
    "ack_compaction" -> txnAckSql,
    // READ_COMMITTED sees exactly the committed txn's slice, re-routed
    // by key hash with dense offsets; the aborted and in-flight slices
    // must contribute NOTHING,
    "shadow_read" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), routed AS (
        |  SELECT CAST(mm3_8(key) % 4 AS INT) AS partition FROM envelope)
        |SELECT 'persistent://public/default/events-shadow' AS topic,
        |  partition, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) - 1 AS BIGINT) AS max_offset
        |FROM routed GROUP BY partition ORDER BY partition""".stripMargin),
    // coalesce+vacuum must be content-neutral: same oracle as the plain
    // produce round trip — a lost or duplicated row breaks the match,
    "coalesce_roundtrip" -> topicLogRoundtripSql,
    // offload + transparent hot∪cold read must preserve the same truth,
    "file_sink_roundtrip" -> topicLogRoundtripSql,
    "datagen_persons" -> graft.sources.DataGeneratorSource.oracleSql(1000, "dg"),
    "multimodal_pipeline" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id % 6 AS k,
        |    CAST(64 + (doc_id % 512) AS INT) AS w,
        |    CAST(64 + ((doc_id * 7) % 512) AS INT) AS h,
        |    CAST(1 + (doc_id % 2) AS INT) AS wav_ch,
        |    8000 + (doc_id % 100) * 16 AS wav_data,
        |    list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
        |      CAST(1 + (doc_id % 14) AS INT)) AS kbps,
        |    2000 + (doc_id % 50) * 100 AS mp3_bytes,
        |    30000 + (doc_id % 100) * 500 AS mp4_dur
        |  FROM documents)
        |SELECT doc_id,
        |  CASE k WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
        |         WHEN 3 THEN 'wav' WHEN 4 THEN 'mp3' ELSE 'mp4' END AS format,
        |  CASE WHEN k < 3 OR k = 5 THEN w END AS width,
        |  CASE WHEN k < 3 OR k = 5 THEN h END AS height,
        |  CASE WHEN k < 3 OR k = 5 THEN CAST(3 AS INT) WHEN k = 3 THEN wav_ch
        |       ELSE CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS INT) END AS n_channels,
        |  CAST(CASE WHEN k < 3 THEN 0
        |            WHEN k = 3 THEN (wav_data * 1000) // (8000 * wav_ch * 2)
        |            WHEN k = 4 THEN (mp3_bytes * 8) // kbps
        |            ELSE mp4_dur END AS BIGINT) AS duration_ms,
        |  CASE WHEN k < 3 OR k = 5 THEN CAST(floor(w * least(CAST(1 AS DOUBLE), CAST(256 AS DOUBLE) / greatest(w, h))) AS INT) END AS target_width
        |FROM m ORDER BY doc_id""".stripMargin,
    // REAL pixel decode: the engine writes a solid-gray PNG per doc
    // with ImageIO's encoder and decodes it back through the pluggable
    // codec seam; the oracle inverts the gray/size arithmetic with no
    // codec — mean luma of a solid-gray image IS the gray level
    "media_pixels" ->
      """SELECT CAST(doc_id % 16 AS BIGINT) AS g,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(1 + doc_id % 8) AS BIGINT) AS sum_w,
        |  CAST(SUM(1 + doc_id % 5) AS BIGINT) AS sum_h,
        |  CAST(SUM(3) AS BIGINT) AS sum_ch,
        |  CAST(SUM(doc_id % 256) AS BIGINT) AS sum_luma
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
    // Every registered query has an oracle. The similarity tier is
    // checked by reproducing LSH bucketing in SQL (murmur3 hyperplanes)
    // or by brute-forcing the exact-verified truth set; multimodal by
    // inverting the fixture formulas; hll_cardinality by a self-checking
    // error-bound certificate beside exact counts.
  )
}
