package graft.sources

import graft.log.TopicLog
import graft.model.Envelope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Kafka → topic source, mapped Spark-first (reference
 * pulsar-io/kafka/src/main/java/org/apache/pulsar/io/kafka/
 * KafkaAbstractSource.java:56 and KafkaSourceConfig.java:45-149).
 *
 * Split exactly like the JDBC connector: the part that holds the bugs —
 * config validation, consumer-option assembly, per-partition offset
 * resume, auto.offset.reset semantics, header copy — is implemented and
 * tested here against an in-sandbox fake broker (a DataFrame with the
 * Kafka record shape). The network layer is Spark's own Kafka source:
 * in a real deployment `spark.readStream.format("kafka")` with
 * [[KafkaSourceConfig.sparkReadOptions]] replaces the fake, and each
 * microbatch flows through [[KafkaConnector.pollToTopic]] unchanged.
 *
 * Offset model: the reference consumer either auto-commits to Kafka or
 * commitSync()s after the produce futures complete
 * (KafkaAbstractSource.java:186-192) — either way the consumer group's
 * committed offset is the resume point, and a crash between produce and
 * commit replays records (at-least-once). Here the resume point is the
 * TOPIC LOG ITSELF: the Kafka offset is the envelope sequence id and the
 * producer name encodes the Kafka partition, so `resumeOffsets` recovers
 * the exact committed position from the log and a replayed poll appends
 * nothing twice (§2.8 dedup by construction). No side-channel offset
 * store can drift from the data — strictly stronger than the reference's
 * at-least-once window.
 */
object KafkaConnector {

  /** Kafka record-batch columns, byte-compatible with what
    * `spark.readStream.format("kafka")` exposes — the fake broker in the
    * spec and the real source produce the same shape. */
  val RecordColumns: Seq[String] =
    Seq("topic", "partition", "offset", "key", "value", "timestamp", "headers")

  /** Reference header keys (KafkaAbstractSource.java:57-59). */
  val HeaderKafkaTopic = "__kafka_topic"
  val HeaderKafkaPartition = "__kafka_partition"
  val HeaderKafkaOffset = "__kafka_offset"

  /** One producer identity per Kafka partition: offsets are monotone per
    * partition, so (producer, sequence) = (partition producer, offset) is
    * the dedup key that makes replays idempotent. */
  def producerName(cfg: KafkaSourceConfig, partition: Int): String =
    s"${producerPrefix(cfg)}$partition"

  /** The topic/group segments carry their LENGTHS, so distinct
    * (topic, groupId) pairs can never collide through the '-' joiner —
    * ("t", "g-p2") vs ("t-g", "p2") previously produced the same
    * prefix, and resumeOffsets would then merge the two sources'
    * offset high-waters, silently skipping records. */
  private def producerPrefix(cfg: KafkaSourceConfig): String =
    s"io-kafka-source-${cfg.topic.length}:${cfg.topic}-" +
      s"${cfg.groupId.length}:${cfg.groupId}-p"

  /** Marker property stamped on the synthetic row a `latest` reset
    * appends to pin the skip position (Pulsar's own pattern: positions
    * travel as in-stream marker messages, never a side channel).
    * Consumers filter markers with [[dataRows]]. */
  val ResetMarkerProp = "__kafka_reset_marker"

  /** The topic minus reset markers — what a consumer should read. */
  def dataRows(log: DataFrame): DataFrame =
    if (!log.columns.contains(Envelope.Properties)) log
    else log.filter(coalesce(
      element_at(col(Envelope.Properties), ResetMarkerProp).isNull, lit(true)))

  /**
   * Committed resume offset per Kafka partition, recovered from the topic
   * log (the analogue of the consumer group's committed offsets). A
   * partition absent from the map has never been consumed — the
   * auto.offset.reset policy decides where it starts.
   */
  /** Pre-length-prefix producer name format (builds before the
    * collision fix): read-only, for [[resumeOffsets]] upgrade
    * continuity. Ambiguous by construction — ("t", "g-p2") and
    * ("t-g", "p2") share a prefix — which is exactly why writes moved
    * to the length-prefixed format; accepting it on READ only restores
    * the high-water of topics written by older builds (without it a
    * restarted source re-ingests everything under new producer names
    * that (producer, sequence) dedup can't suppress). */
  private def legacyProducerPrefix(cfg: KafkaSourceConfig): String =
    s"io-kafka-source-${cfg.topic}-${cfg.groupId}-p"

  def resumeOffsets(topic: TopicLog, cfg: KafkaSourceConfig): Map[Int, Long] = {
    val log = topic.read()
    if (log.isEmpty) Map.empty
    else {
      // strict match: prefix + digits. A bare startsWith would let group
      // "g1"'s prefix swallow group "g1-p1"'s producers (crash or, for
      // numeric tails, silent cross-group offset merging).
      def highWaters(prefix: String): Map[Int, Long] = {
        val strict = "^" + java.util.regex.Pattern.quote(prefix) + "[0-9]+$"
        log.filter(col(Envelope.ProducerName).rlike(strict))
          .groupBy(Envelope.ProducerName)
          .agg(max(Envelope.SequenceId).as("hi"))
          .collect() // bounded: one row per Kafka partition
          .map(r => r.getString(0).stripPrefix(prefix).toInt -> r.getLong(1))
          .toMap
      }
      // a legacy high-water is consulted ONLY for partitions with no
      // current-format rows yet (the fresh-upgrade state). Because the
      // legacy format is ambiguous — ("t", "g-p2") and ("t-g", "p2")
      // share a prefix — an unconditional max-merge could adopt a
      // DIFFERENT config's offsets and permanently SKIP records; gated
      // per partition, the failure mode is bounded to DUPLICATES
      // instead: in a rollback/re-upgrade sequence where an old build
      // wrote legacy rows ABOVE the current high-water, those records
      // re-ingest under the current producer name (and cross-format
      // (producer, sequence) dedup cannot suppress them — the names
      // differ). Duplication is the at-least-once envelope; skipping is
      // silent loss — we pick the former, and surface the signature of
      // the rollback case loudly.
      val current = highWaters(producerPrefix(cfg))
      val legacy = highWaters(legacyProducerPrefix(cfg))
      legacy.foreach { case (p, o) =>
        if (current.get(p).exists(_ < o))
          System.err.println(s"[kafka-source] partition $p: legacy-format " +
            s"high-water $o exceeds current-format ${current(p)} — " +
            "mixed-build writes detected; records between them will " +
            "re-ingest as duplicates (at-least-once), not be skipped")
      }
      val adopted = legacy.filter { case (p, _) => !current.contains(p) }
      // Residual risk on the adoption path itself: for a partition with
      // NO current-format rows the mixed-build warning above cannot
      // fire, and if two configs with colliding legacy prefixes (e.g.
      // ("t", "g-p2") / ("t-g", "p2")) ever fed the SAME destination
      // log, the adopted high-water may belong to the OTHER config —
      // silently skipping records 0..hi. That state is unreachable when
      // each (topic, group) owns its destination topic (the documented
      // deployment shape), so adoption is surfaced for audit rather
      // than rejected.
      adopted.foreach { case (p, o) =>
        System.err.println(s"[kafka-source] partition $p: adopting " +
          s"LEGACY-format high-water $o (no current-format rows yet). " +
          "If multiple source configs with colliding legacy prefixes " +
          "ever shared this destination topic, this offset could " +
          "belong to the other config and skip its backlog — audit " +
          "before trusting the resume point.")
      }
      current ++ adopted
    }
  }

  /**
   * One poll: append every record of `records` that sits strictly above
   * the resume point of its partition. `records` carries the Kafka batch
   * shape ([[RecordColumns]]) — in production a microbatch from Spark's
   * Kafka source, in tests the fake broker's current backlog (so a poll
   * with an already-seen backlog is exactly a replay).
   *
   * Partitions never seen before follow `autoOffsetReset`
   * (KafkaSourceConfig.java:137, default "earliest"): `earliest` takes the
   * partition from its first available record; `latest` skips the existing
   * backlog by PERSISTING the partition's current top as the committed
   * position — an in-stream reset-marker row (Pulsar's own pattern for
   * position metadata; [[dataRows]] filters it) — so the reset anchors
   * exactly once and records arriving after this poll flow normally.
   * That is the reference consumer's semantics for a group with no
   * committed offset.
   *
   * Header copy (KafkaAbstractSource.java:207-219, copyHeadersEnabled
   * default false): when enabled, envelope `properties` carries
   * __kafka_topic/__kafka_partition/__kafka_offset plus each record
   * header base64-encoded.
   *
   * Returns the number of rows appended.
   */
  def pollToTopic(topic: TopicLog, cfg: KafkaSourceConfig,
                  records: DataFrame): Long = {
    val resume = resumeOffsets(topic, cfg)
    // the topic filter applies BEFORE any offset bookkeeping: a batch
    // carrying several topics must not let a foreign topic's offsets on
    // the same partition number anchor this topic's skip position
    val topicRecords = records.filter(col("topic") === cfg.topic)
    // earliest: an unseen partition replays from its first record (resume
    // below any offset — the Long.MinValue fold default); latest: an
    // unseen partition resumes AT its current top, and that position is
    // PERSISTED as a reset-marker row so the next poll resumes there
    // instead of re-anchoring to whatever the new top happens to be
    // (which would skip every record forever)
    val startAt: Map[Int, Long] =
      if (cfg.autoOffsetReset == "latest") {
        val tops = topicRecords.groupBy("partition")
          .agg(max("offset").as("top")).collect() // bounded: per partition
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        val unseen = tops.filter { case (p, _) => !resume.contains(p) }
        if (unseen.nonEmpty) {
          val spark = topic.spark
          import spark.implicits._
          val markers = unseen.toSeq.toDF("p", "top").select(
            concat(lit("__kafka-reset-"), col("p").cast("string"))
              .as(Envelope.Key),
            lit(null).cast("string").as(Envelope.Value),
            concat(lit(producerPrefix(cfg)), col("p").cast("string"))
              .as(Envelope.ProducerName),
            col("top").as(Envelope.SequenceId),
            current_timestamp().as(Envelope.PublishTime),
            current_timestamp().as(Envelope.EventTime),
            map(lit(ResetMarkerProp), lit("true")).as(Envelope.Properties))
          topic.append(markers): Unit // markers are not data rows
        }
        tops.map { case (p, top) => p -> resume.getOrElse(p, top) }
      } else resume
    val resumeExpr = startAt.foldLeft(lit(Long.MinValue)) {
      case (acc, (p, off)) => when(col("partition") === p, off).otherwise(acc)
    }
    val slice = topicRecords.filter(col("offset") > resumeExpr)
    val props =
      if (cfg.copyHeadersEnabled) {
        // Kafka headers are a LIST and legally repeat keys; the reference
        // folds them through properties.put (last write wins). A plain
        // map_from_entries would throw 'Duplicate map key' under the
        // default dedup policy — fold with put semantics instead.
        val headerMap = coalesce(
          aggregate(col("headers"), map().cast("map<string,string>"),
            (acc, h) => map_concat(
              map_filter(acc, (k, _) => k =!= h.getField("key")),
              map(h.getField("key"), base64(h.getField("value"))))),
          map().cast("map<string,string>"))
        // a record header named __kafka_* must WIN over the synthetic
        // metadata — the reference's properties.put(header.key) runs
        // after the __kafka_* puts and overwrites (KafkaAbstractSource
        // .java:207-219). map_concat errors on duplicate keys, so drop
        // colliding synthetic entries first.
        val meta = map_filter(
          map(
            lit(HeaderKafkaTopic), col("topic"),
            lit(HeaderKafkaPartition), col("partition").cast("string"),
            lit(HeaderKafkaOffset), col("offset").cast("string")),
          (k, _) => !map_contains_key(headerMap, k))
        map_concat(meta, headerMap)
      } else map().cast("map<string,string>")
    val envelope = slice.select(
      col("key").cast("string").as(Envelope.Key),
      col("value").cast("string").as(Envelope.Value),
      concat(lit(producerPrefix(cfg)), col("partition").cast("string"))
        .as(Envelope.ProducerName),
      col("offset").as(Envelope.SequenceId),
      current_timestamp().as(Envelope.PublishTime),
      col("timestamp").as(Envelope.EventTime),
      props.as(Envelope.Properties))
    if (slice.isEmpty) 0L else topic.append(envelope)
  }

  /**
   * Topic → Kafka record projection (reference KafkaAbstractSink.java:
   * extractKeyValue + send): the exact DataFrame shape Spark's kafka
   * writer consumes — `key`/`value` binary — applied in per-key offset
   * order (the jdbc/es sink treatment) so downstream compacted topics
   * converge last-write-wins under replay. Production completes with
   * `.write.format("kafka").options(cfg.sparkWriteOptions)`; the
   * projection is the testable part.
   */
  def topicToKafkaFrame(log: DataFrame): DataFrame =
    log.select(col(Envelope.Key), col(Envelope.Value),
        col(Envelope.Offset).as("_apply_order"))
      .repartition(col(Envelope.Key))
      .sortWithinPartitions(col("_apply_order"))
      .select(col(Envelope.Key).cast("binary").as("key"),
        col(Envelope.Value).cast("binary").as("value"))
}

/**
 * Kafka sink configuration (reference pulsar-io/kafka/.../
 * KafkaAbstractSink.java:79-126 open() and KafkaSinkConfig.java:45-121),
 * the producer-side twin of [[KafkaSourceConfig]]: validation mirrors the
 * reference's open()-time checks, defaults mirror the field initializers,
 * TLS/SASL secrets pass through `producerConfig` untyped.
 */
final case class KafkaSinkConfig(
    topic: String,
    bootstrapServers: String,
    acks: String = "all",
    batchSize: Long = 16384L,
    maxRequestSize: Long = 1048576L,
    producerConfig: Map[String, String] = Map.empty) {

  require(topic != null && topic.nonEmpty, "Kafka topic is not set")
  require(bootstrapServers != null && bootstrapServers.nonEmpty,
    "Kafka bootstrapServers is not set")
  require(acks != null && acks.nonEmpty, "Kafka acks is not set")
  require(batchSize > 0, s"Invalid Kafka Producer batchSize : $batchSize")
  require(maxRequestSize > 0,
    s"Invalid Kafka Producer maxRequestSize : $maxRequestSize")

  /** Option map for `df.write.format("kafka")` — explicit config wins
    * over `kafka.`-prefixed passthrough, the reference's property order. */
  def sparkWriteOptions: Map[String, String] =
    producerConfig.map { case (k, v) => s"kafka.$k" -> v } ++ Map(
      "topic" -> topic,
      "kafka.bootstrap.servers" -> bootstrapServers,
      "kafka.acks" -> acks,
      "kafka.batch.size" -> batchSize.toString,
      "kafka.max.request.size" -> maxRequestSize.toString)
}

object KafkaSinkConfig {
  /** Untyped-map loader (reference KafkaSinkConfig.load): unknown keys
    * pass through to the producer config, typed keys coerce. */
  def load(config: Map[String, Any]): KafkaSinkConfig = {
    def str(k: String): Option[String] = config.get(k).map(_.toString)
    val typedKeys = Set("topic", "bootstrapServers", "acks", "batchSize",
      "maxRequestSize")
    KafkaSinkConfig(
      topic = str("topic").orNull,
      bootstrapServers = str("bootstrapServers").orNull,
      acks = str("acks").getOrElse("all"),
      batchSize = str("batchSize").map(_.toLong).getOrElse(16384L),
      maxRequestSize = str("maxRequestSize").map(_.toLong).getOrElse(1048576L),
      producerConfig = config.view.filterKeys(!typedKeys.contains(_))
        .map { case (k, v) => k -> v.toString }.toMap)
  }
}

/**
 * Kafka source configuration, field-for-field against the reference
 * (KafkaSourceConfig.java:45-149) minus the TLS/SASL secrets (which pass
 * straight through to the consumer in both systems — `consumerConfig`
 * here). Defaults match the reference's field initializers.
 */
final case class KafkaSourceConfig(
    topic: String,
    bootstrapServers: String,
    groupId: String,
    fetchMinBytes: Long = 1L,
    autoCommitEnabled: Boolean = true,
    autoCommitIntervalMs: Long = 5000L,
    sessionTimeoutMs: Long = 30000L,
    heartbeatIntervalMs: Long = 3000L,
    autoOffsetReset: String = "earliest",
    copyHeadersEnabled: Boolean = false,
    consumerConfig: Map[String, String] = Map.empty) {

  // the reference validates in open() (KafkaAbstractSource.java:72-91);
  // a case class validates at construction — same checks, same messages
  require(topic != null && topic.nonEmpty, "Kafka topic is not set")
  require(bootstrapServers != null && bootstrapServers.nonEmpty,
    "Kafka bootstrapServers is not set")
  require(groupId != null && groupId.nonEmpty,
    "Kafka consumer group id is not set")
  require(fetchMinBytes > 0, s"Invalid Kafka Consumer fetchMinBytes : $fetchMinBytes")
  require(!autoCommitEnabled || autoCommitIntervalMs > 0,
    s"Invalid Kafka Consumer autoCommitIntervalMs : $autoCommitIntervalMs")
  require(sessionTimeoutMs > 0,
    s"Invalid Kafka Consumer sessionTimeoutMs : $sessionTimeoutMs")
  require(heartbeatIntervalMs > 0,
    s"Invalid Kafka Consumer heartbeatIntervalMs : $heartbeatIntervalMs")
  require(autoOffsetReset == "earliest" || autoOffsetReset == "latest",
    s"Invalid auto.offset.reset : $autoOffsetReset")

  /**
   * The option map for `spark.readStream.format("kafka")` — the
   * production network layer. Explicit config wins over passthrough
   * `consumerConfig`, mirroring the reference's property assembly order
   * (KafkaAbstractSource.java:93-134: props.putAll(passthrough) first,
   * then the typed fields overwrite). Offset commits are Spark
   * checkpoints, so enable.auto.commit/auto.commit.interval.ms and the
   * group's committed position stay out of the option map by design —
   * [[KafkaConnector.resumeOffsets]] is the committed position.
   */
  def sparkReadOptions: Map[String, String] =
    consumerConfig.map { case (k, v) => s"kafka.$k" -> v } ++ Map(
      "subscribe" -> topic,
      "kafka.bootstrap.servers" -> bootstrapServers,
      "kafka.group.id" -> groupId,
      "kafka.fetch.min.bytes" -> fetchMinBytes.toString,
      "kafka.session.timeout.ms" -> sessionTimeoutMs.toString,
      "kafka.heartbeat.interval.ms" -> heartbeatIntervalMs.toString,
      "startingOffsets" -> autoOffsetReset)
}

object KafkaSourceConfig {
  /** Untyped-map loader, the reference's `KafkaSourceConfig.load(Map)`
    * (KafkaSourceConfig.java:156): unknown keys pass through to the
    * consumer config rather than erroring, typed keys coerce. */
  def load(config: Map[String, Any]): KafkaSourceConfig = {
    def str(k: String): Option[String] = config.get(k).map(_.toString)
    def lng(k: String, d: Long): Long = str(k).map(_.toLong).getOrElse(d)
    def bool(k: String, d: Boolean): Boolean =
      str(k).map(_.toBoolean).getOrElse(d)
    val typedKeys = Set("topic", "bootstrapServers", "groupId",
      "fetchMinBytes", "autoCommitEnabled", "autoCommitIntervalMs",
      "sessionTimeoutMs", "heartbeatIntervalMs", "autoOffsetReset",
      "copyHeadersEnabled")
    KafkaSourceConfig(
      topic = str("topic").orNull,
      bootstrapServers = str("bootstrapServers").orNull,
      groupId = str("groupId").orNull,
      fetchMinBytes = lng("fetchMinBytes", 1L),
      autoCommitEnabled = bool("autoCommitEnabled", d = true),
      autoCommitIntervalMs = lng("autoCommitIntervalMs", 5000L),
      sessionTimeoutMs = lng("sessionTimeoutMs", 30000L),
      heartbeatIntervalMs = lng("heartbeatIntervalMs", 3000L),
      autoOffsetReset = str("autoOffsetReset").getOrElse("earliest"),
      copyHeadersEnabled = bool("copyHeadersEnabled", d = false),
      consumerConfig = config.view.filterKeys(!typedKeys.contains(_))
        .map { case (k, v) => k -> v.toString }.toMap)
  }
}
