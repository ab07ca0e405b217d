package graft.streaming

import graft.log.TopicLog
import graft.model.Envelope
import graft.functions.Murmur3Pulsar
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, StreamingQuery, Trigger}

/**
 * Subscription = named durable cursor + dispatch mode over a topic
 * (reference SubscriptionType.java:33-61; PersistentSubscription).
 *
 * Spark mapping (SURVEY.md §1.1/§2.10): each subscription is a streaming
 * query over the topic log with its own checkpoint directory (the cursor).
 * Dispatch modes become plan shapes:
 *  - Exclusive/Failover: one query, per-partition order preserved
 *    (`sortWithinPartitions(offset)` inside each microbatch);
 *  - Shared: unordered fan-out — `repartition(n)` round-robin, per-message
 *    acks tracked in the ack-state table;
 *  - Key_Shared: `repartition(n, pulsar_hash(key))` — Spark's hash
 *    exchange IS the sticky assignment (stronger than the reference:
 *    assignment never rebalances mid-run).
 *
 * Flow control (reference CommandFlow permits, ConsumerImpl.java:1098):
 * `maxFilesPerTrigger` / `maxBytesPerTrigger` + trigger interval bound
 * each microbatch — the BatchReceivePolicy.java:66 knobs.
 */
sealed trait SubscriptionType
object SubscriptionType {
  case object Exclusive extends SubscriptionType
  case object Failover extends SubscriptionType
  case object Shared extends SubscriptionType
  case object KeyShared extends SubscriptionType
}

final case class BatchReceivePolicy(
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[String] = None,
    trigger: Trigger = Trigger.AvailableNow())

final class Subscription(
    val log: TopicLog,
    val name: String,
    val subType: SubscriptionType,
    val checkpointRoot: String,
    val numWorkers: Int = 4,
    val policy: BatchReceivePolicy = BatchReceivePolicy(),
    // shadow-topic subscriptions consume the SOURCE log but must surface
    // the shadow's topic name on every row (graft.log.ShadowTopic)
    val topicOverride: Option[String] = None) {

  private def spark: SparkSession = log.spark

  /** Cursor location — one checkpoint dir per (topic, subscription). */
  def checkpointDir: String =
    s"$checkpointRoot/${log.name.tenant}/${log.name.namespace}/${log.name.topic}/$name"

  /** Streaming view of the topic log (file-source incremental read).
    * Works on an empty (never-appended) topic via the envelope schema. */
  def stream(): DataFrame = {
    val schema =
      try spark.read.parquet(log.name.path(log.root)).schema
      catch {
        // ONLY the empty/absent-topic case falls back to the envelope
        // schema (subscribing before the first append is legal); a
        // transient IO/permission failure must stay loud — swallowing
        // it would pin a wrong schema for the query's whole lifetime
        case _: org.apache.spark.sql.AnalysisException => Envelope.schema
      }
    var r: DataStreamReader = spark.readStream.schema(schema)
    policy.maxFilesPerTrigger.foreach(n =>
      r = r.option("maxFilesPerTrigger", n))
    policy.maxBytesPerTrigger.foreach(b =>
      r = r.option("maxBytesPerTrigger", b))
    val raw = r.parquet(log.name.path(log.root))
    // withColumn both replaces and adds, so the relabel holds even for
    // a log whose physical schema lacks the topic column
    val df = topicOverride.fold(raw)(fqn =>
      raw.withColumn(Envelope.Topic, lit(fqn)))
    subType match {
      case SubscriptionType.Exclusive | SubscriptionType.Failover => df
      case SubscriptionType.Shared => df.repartition(numWorkers)
      case SubscriptionType.KeyShared =>
        // same sticky key as every Dispatch selector (ordering key if
        // present, else key, else NONE_KEY — Commands.peekStickyKey)
        df.repartition(numWorkers,
          pmod(Murmur3Pulsar.pulsar_hash(
            graft.operators.Dispatch.stickyRoutingKey(df)), lit(65536)))
    }
  }

  /**
   * Run the subscription into `process` via foreachBatch — the consumer
   * loop. Checkpoint commit = cumulative ack (cursor markDelete).
   *
   * READ_COMMITTED: the file source lists raw parquet, which can include
   * orphaned files from a producer crash between data write and manifest
   * commit — each microbatch is filtered to the manifest high-water so
   * subscribers never observe uncommitted rows (the same gate
   * TopicLog.read applies to batch readers).
   */
  def consume(process: (DataFrame, Long) => Unit): StreamingQuery =
    stream().writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(policy.trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.ext.BatchTune.adapt(batch)
        val hw = log.highWater()
        val committed =
          if (hw.isEmpty) batch.limit(0)
          else if (batch.columns.contains(Envelope.Offset)) batch.filter(
            hw.map { case (p, o) =>
              (col(Envelope.Partition) === p) && (col(Envelope.Offset) <= o)
            }.reduce(_ || _))
          else batch
        process(committed, epochId)
      }
      .start()

  /**
   * Seek (reference Consumer.seek:513): drop the cursor and restart from
   * a position. With a file-source the position is expressed as a filter;
   * durable seek = wipe checkpoint + filtered restart.
   */
  def seekFilter(fromOffset: Long): DataFrame =
    stream().filter(col(Envelope.Offset) >= fromOffset)

  /**
   * [[consume]] under a dispatch rate limit (reference
   * DispatchRateLimiterAsyncTokenBucketImpl: per-subscription token
   * bucket consulted at dispatch time): each microbatch's rows are
   * ADMITTED against a [[TokenBucket]] before `process` runs — the
   * consumer loop pauses until the batch's row count is fully granted,
   * so long-run dispatch throughput ≤ `rateMsgsPerSec` and an idle
   * subscription's first batch may burst up to `burst` messages
   * instantly. `maxFilesPerTrigger` (the BatchReceivePolicy) still
   * bounds batch SIZE; the bucket bounds batch TIMING — together they
   * are the reference's dispatch throttle. The bucket runs on the
   * driver: admission is a per-microbatch scalar decision (one count +
   * one bucket update per trigger), never per-row work, so the
   * throttle adds nothing to executor-side cost at any scale.
   */
  def consumeRateLimited(rateMsgsPerSec: Double, burst: Long,
                         clock: () => Long = System.nanoTime)(
                         process: (DataFrame, Long) => Unit): StreamingQuery =
    consumeRateLimitedDual(Some((rateMsgsPerSec, burst)), None, clock)(process)

  /** One metering job for both throttle dimensions: (row count, payload
    * octets) per microbatch, octets by the canonical storage-size
    * definition — Admin.payloadOctets — so byte-rate throttling can
    * never drift from topicStats/rates. Shared by both admission
    * disciplines. */
  private def meterBatch(batch: DataFrame): org.apache.spark.sql.Row =
    batch.agg(
      count(lit(1)).as("n"),
      coalesce(sum(graft.log.Admin.payloadOctets), lit(0L)).as("octets"))
      .head()

  /**
   * Dual-dimension dispatch throttle — the reference enforces msg-rate
   * AND byte-rate token buckets SIMULTANEOUSLY
   * (DispatchRateLimiter dispatchThrottlingRatePerTopicInMsg/InByte;
   * DispatchRate.java): a batch dispatches only once BOTH buckets have
   * granted its row count and its payload octets (value + key — the
   * same storage-size definition as Admin.payloadOctets), so long-run
   * throughput respects whichever limit binds. Each dimension is
   * `Some((ratePerSec, burstCapacity))`; None = unlimited on that
   * dimension. One metering aggregate per microbatch (count + octet
   * sum in a single job), driver-side scalar admission as in
   * [[consumeRateLimited]].
   */
  def consumeRateLimitedDual(msgs: Option[(Double, Long)],
                             bytes: Option[(Double, Long)],
                             clock: () => Long = System.nanoTime)(
                             process: (DataFrame, Long) => Unit): StreamingQuery = {
    require(msgs.nonEmpty || bytes.nonEmpty,
      "rate-limited consume needs at least one dimension")
    var msgBucket = msgs.map { case (r, b) => TokenBucket.full(r, b, clock()) }
    var byteBucket = bytes.map { case (r, b) => TokenBucket.full(r, b, clock()) }
    val minSleepMs = {
      val rates = msgs.map(_._1).toSeq ++ bytes.map(_._1).toSeq
      math.min(50L, math.max(1L, (1000 / rates.max).toLong))
    }
    consume { (batch, epochId) =>
      // ONE metering job for both dimensions — the batch recomputes for
      // process(), the same two-pass shape consume()'s manifest gate
      // already accepts for harness-scale batches
      val meter = meterBatch(batch)
      var needMsgs = if (msgBucket.isDefined) meter.getLong(0) else 0L
      var needBytes = if (byteBucket.isDefined) meter.getLong(1) else 0L
      while (needMsgs > 0 || needBytes > 0) {
        val now = clock()
        if (needMsgs > 0) msgBucket.foreach { b =>
          val (b2, granted) = b.acquire(needMsgs, now)
          msgBucket = Some(b2); needMsgs -= granted
        }
        if (needBytes > 0) byteBucket.foreach { b =>
          val (b2, granted) = b.acquire(needBytes, now)
          byteBucket = Some(b2); needBytes -= granted
        }
        if (needMsgs > 0 || needBytes > 0)
          // sleep roughly until the next token accrues (bounded at 50ms
          // so a clock step never oversleeps)
          Thread.sleep(minSleepMs)
      }
      process(batch, epochId)
    }
  }

  /**
   * [[consumeRateLimitedDual]] under the reference's EXACT dispatch
   * discipline (AsyncTokenBucket usage flow, AsyncTokenBucket.java:34-47):
   * the batch dispatches FIRST and its whole size consumes from each
   * bucket unconditionally — the balance may go negative — then, if
   * either bucket is out of tokens, the loop pauses for that bucket's
   * calculateThrottlingDuration before the next trigger. Overshoot is
   * bounded by one batch; long-run throughput still converges to the
   * configured rate (the debt extends the following pause). Prefer
   * [[consumeRateLimitedDual]] when batches are small relative to burst
   * (identical long-run behavior, no overshoot); this twin exists for
   * drop-in parity with brokers tuned around the reference's
   * dispatch-then-throttle timing.
   */
  def consumeRateLimitedDebt(msgs: Option[(Double, Long)],
                             bytes: Option[(Double, Long)],
                             clock: () => Long = System.nanoTime)(
                             process: (DataFrame, Long) => Unit): StreamingQuery = {
    require(msgs.nonEmpty || bytes.nonEmpty,
      "rate-limited consume needs at least one dimension")
    var msgBucket = msgs.map { case (r, b) => TokenBucket.full(r, b, clock()) }
    var byteBucket = bytes.map { case (r, b) => TokenBucket.full(r, b, clock()) }
    consume { (batch, epochId) =>
      val meter = meterBatch(batch)
      process(batch, epochId) // dispatch first — the debt pays afterwards
      val now = clock()
      var throttled = false
      msgBucket = msgBucket.map { b =>
        val (b2, ok) = b.consumeAndCheck(meter.getLong(0), now)
        throttled ||= !ok; b2
      }
      byteBucket = byteBucket.map { b =>
        val (b2, ok) = b.consumeAndCheck(meter.getLong(1), now)
        throttled ||= !ok; b2
      }
      while (throttled) {
        val n2 = clock()
        val waitNanos = (msgBucket.map(_.throttleNanos(n2)).toSeq ++
          byteBucket.map(_.throttleNanos(n2)).toSeq).max
        if (waitNanos == 0L) throttled = false
        else Thread.sleep(math.min(50L, math.max(1L, waitNanos / 1000000L)))
      }
    }
  }
}

/**
 * Ack-state table: selective (out-of-order) acks that a plain checkpoint
 * cursor can't express — reference ManagedCursorImpl.individualDeletedMessages
 * (ManagedCursorImpl.java:203) + batch-index acks (AckSetState.java).
 *
 * Layout: parquet log of ack events keyed (partition, offset, batch_index);
 * the mark-delete position per partition is the highest offset below which
 * every message is acked. At scale the ack log compacts periodically into
 * (partition, markDelete, individually_acked_ranges).
 */
object AckState {
  def emptyAcks(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("partition",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("offset",
          org.apache.spark.sql.types.LongType))))

  /** markDeletePosition per partition: highest prefix-complete offset.
    * Computed distributed: rank acked offsets per partition; the prefix
    * is intact while offset == rank - 1 (dense from 0). */
  def markDeletePosition(acks: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("partition").orderBy("offset")
    acks.select(col("partition"), col("offset")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("offset") === col("rn") - 1)
      .groupBy("partition").agg(max("offset").as("mark_delete"))
  }

  /**
   * Batch-index acks (reference AckSetState / EntryBatchIndexesAcks;
   * `acknowledgmentAtBatchIndexLevelEnabled`): individual messages inside
   * a batched entry ack independently; the entry completes — and can
   * advance markDelete — only when every batch index is acked.
   *
   * `acks` carries (partition, offset, batch_index); `entrySizes` carries
   * (partition, offset, batch_size). Returns completed entries, feeding
   * [[markDeletePosition]].
   */
  def completedEntries(acks: DataFrame, entrySizes: DataFrame): DataFrame =
    acks.select(col("partition"), col("offset"), col("batch_index")).distinct()
      .groupBy("partition", "offset")
      .agg(count(lit(1)).as("acked"))
      .join(entrySizes, Seq("partition", "offset"))
      .filter(col("acked") === col("batch_size"))
      .select("partition", "offset")

  /** Batch-index-aware markDelete: dense prefix over COMPLETED entries. */
  def markDeleteWithBatchAcks(acks: DataFrame, entrySizes: DataFrame): DataFrame =
    markDeletePosition(completedEntries(acks, entrySizes))

  /** Unacked backlog per partition (reference BacklogQuotaManager input):
    * messages above markDelete not individually acked. */
  def backlog(log: DataFrame, acks: DataFrame): DataFrame =
    log.select(col(Envelope.Partition).as("partition"), col(Envelope.Offset).as("offset"))
      .join(acks.select(col("partition"), col("offset")).distinct(),
        Seq("partition", "offset"), "left_anti")
      .groupBy("partition").agg(count(lit(1)).as("backlog"))

  /**
   * Unacked-message timeout tracker (reference UnAckedMessageTracker:
   * messages delivered but not acked within `ackTimeout` are redelivered
   * with redelivery_count+1). `delivered` carries (partition, offset,
   * delivered_at); returns the redelivery set with bumped counts and a
   * backoff deliver_at (NegativeAcksTracker/RedeliveryBackoff).
   */
  def redeliverOnTimeout(log: DataFrame, delivered: DataFrame, acks: DataFrame,
                         now: java.sql.Timestamp, ackTimeoutMs: Long,
                         backoffBaseMs: Long = 60000L): DataFrame = {
    val timedOut = delivered
      .filter(col("delivered_at") <=
        new java.sql.Timestamp(now.getTime - ackTimeoutMs))
      .join(acks.select(col("partition"), col("offset")).distinct(),
        Seq("partition", "offset"), "left_anti")
    log.join(timedOut.select("partition", "offset"),
        Seq(Envelope.Partition, Envelope.Offset))
      .withColumn(Envelope.RedeliveryCnt,
        coalesce(col(Envelope.RedeliveryCnt), lit(0)) + 1)
      .withColumn(Envelope.DeliverAt,
        lit(now) + expr(s"make_interval(0,0,0,0,0,0," +
          s"$backoffBaseMs * pow(2, ${Envelope.RedeliveryCnt} - 1) / 1000.0)"))
  }
}
