package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Canonical message-envelope schema for topic logs.
 *
 * Mirrors the reference's message model (behavioral spec only):
 *  - `Message.java` accessors: key, value, eventTime, publishTime,
 *    sequenceId, orderingKey, properties, schemaVersion, redeliveryCount
 *    (reference pulsar-client-api/.../api/Message.java:49-272)
 *  - wire `MessageMetadata` / `SingleMessageMetadata`
 *    (reference pulsar-common/src/main/proto/PulsarApi.proto:106,168)
 *
 * Deliberately isomorphic to Spark's Kafka source schema so every
 * downstream operator is plain Catalyst.
 */
object Envelope {
  val Topic          = "topic"
  val Partition      = "partition"
  val Offset         = "offset"
  val BatchIndex     = "batch_index"
  val Key            = "key"
  val OrderingKey    = "ordering_key"
  val Value          = "value"
  val ProducerName   = "producer_name"
  val SequenceId     = "sequence_id"
  val PublishTime    = "publish_time"
  val EventTime      = "event_time"
  val Properties     = "properties"
  val SchemaVersion  = "schema_version"
  val DeliverAt      = "deliver_at"
  val RedeliveryCnt  = "redelivery_count"
  val ReplicatedFrom = "replicated_from"

  /** Full envelope schema (SURVEY.md §1.4). */
  val schema: StructType = StructType(Seq(
    StructField(Topic, StringType),
    StructField(Partition, IntegerType),
    StructField(Offset, LongType),
    StructField(BatchIndex, IntegerType),
    StructField(Key, StringType),
    StructField(OrderingKey, BinaryType),
    StructField(Value, BinaryType),
    StructField(ProducerName, StringType),
    StructField(SequenceId, LongType),
    StructField(PublishTime, TimestampType),
    StructField(EventTime, TimestampType),
    StructField(Properties, MapType(StringType, StringType)),
    StructField(SchemaVersion, IntegerType),
    StructField(DeliverAt, TimestampType),
    StructField(RedeliveryCnt, IntegerType),
    StructField(ReplicatedFrom, StringType)
  ))

  /**
   * Deterministic envelope view over the driver `events` table — the shared
   * fixture generator used by both the Spark queries and the DuckDB oracle
   * (FIXTURES.md §B): no randomness, every column derives from event columns.
   *
   *  - partition      = user_id % 4 (4-partition topic, key-hash routing stand-in)
   *  - offset         = event_id (publish order; monotonic per partition too)
   *  - key            = user_id as string
   *  - value          = props JSON; tombstone (NULL) when event_type = 'error'
   *    (compaction tombstone = empty payload, reference
   *    AbstractTwoPhaseCompactor.java:118 keyed null-payload handling)
   *  - producer_name  = 'p' || user_id % 4
   *  - sequence_id    = event_id, with an injected duplicate of the previous
   *    sequence on every 10th event (dedup fixture)
   *  - deliver_at     = ts + (event_id % 7) hours (delayed-delivery fixture)
   *  - redelivery_count = event_id % 5 (DLQ fixture)
   *  - replicated_from = 'cluster-' || event_id % 3 (geo-replication fixture)
   */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    // historical fixtures stored ts as TIMESTAMP(NANOS); with the legacy
    // conf Spark surfaces those as a nanos long (see normalizeTs)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    project(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /**
   * Normalize the fixture `ts` column to a session-tz TIMESTAMP whatever
   * the parquet physically stores: TIMESTAMP(NANOS) read as a nanos long
   * (legacy conf above; truncated to micros — the DuckDB oracle applies
   * the identical `epoch_ns(ts) // 1000`), TIMESTAMP_NTZ micros (current
   * driver output; UTC session tz makes the cast the same instant), or
   * an already-LTZ timestamp (identity).
   */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType => df.withColumn(tsCol,
        expr(s"timestamp_micros($tsCol div 1000)"))
      case _: TimestampNTZType => df.withColumn(tsCol,
        col(tsCol).cast(TimestampType))
      case _ => df
    }

  /** [[fromEvents]] as a STREAMING source: the same envelope projection
    * over `readStream` (schema pinned from a batch peek), so streaming
    * operators can run against the identical deterministic fixture and
    * be oracle-compared to their batch twins. */
  def fromEventsStream(spark: SparkSession, sfDir: String,
                       maxFilesPerTrigger: Int = 8): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    project(streamTable(spark, sfDir, "events", maxFilesPerTrigger))
  }

  /** Streaming file source over `$sfDir/$table.parquet` that accepts BOTH
    * fixture shapes: the driver writes a single parquet FILE at that path
    * (streamed as the parent dir filtered to the one file), while scaled
    * fixtures (ScaleUp) write a DIRECTORY of part-files (streamed as the
    * directory itself, all `*.parquet` parts). A glob filter that only
    * matches the file shape silently streams NOTHING on the directory
    * shape — which is exactly how the r8 10× probe benched empty streams.
    *
    * `maxFilesPerTrigger` is the batch-receive granularity (the file-
    * source analog of BatchReceivePolicy): the default 8 keeps the
    * single-file driver fixtures at one trigger while letting a
    * many-part scaled fixture amortize per-trigger overhead across 8
    * files — at 1, the 10× probe's 32-part fixtures spent the whole
    * measurement on 32 trigger setups instead of on data. */
  def streamTable(spark: SparkSession, sfDir: String, table: String,
                  maxFilesPerTrigger: Int = 8): DataFrame = {
    val path = s"$sfDir/$table.parquet"
    val schema = spark.read.parquet(path).schema
    val reader = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    if (graft.log.PathIO.isDirectory(graft.log.PathIO.path(path)))
      reader.option("pathGlobFilter", "*.parquet").parquet(path)
    else
      reader.option("pathGlobFilter", s"$table.parquet").parquet(sfDir)
  }

  private def project(raw: DataFrame): DataFrame = {
    val ev = normalizeTs(raw)
    ev.select(
      lit("persistent://public/default/events").as(Topic),
      (col("user_id") % 4).cast(IntegerType).as(Partition),
      col("event_id").as(Offset),
      lit(0).as(BatchIndex),
      col("user_id").cast(StringType).as(Key),
      when(col("event_type") === "error", lit(null).cast(StringType))
        .otherwise(col("props")).as(Value),
      concat(lit("p"), (col("user_id") % 4).cast(StringType)).as(ProducerName),
      when(col("event_id") % 10 === 0, col("event_id") - 1)
        .otherwise(col("event_id")).as(SequenceId),
      col("ts").as(PublishTime),
      col("ts").as(EventTime),
      col("event_type").as("event_type"),
      col("value").as("metric_value"),
      (col("ts") + expr("make_interval(0,0,0,0,event_id % 7,0,0)")).as(DeliverAt),
      (col("event_id") % 5).cast(IntegerType).as(RedeliveryCnt),
      concat(lit("cluster-"), (col("event_id") % 3).cast(StringType)).as(ReplicatedFrom)
    )
  }

  /**
   * The same derivation as [[fromEvents]] in DuckDB SQL, for oracle queries.
   * Kept as a CTE fragment so every oracle shares one definition.
   */
  val duckdbCte: String =
    """ev AS (
      |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
      |),
      |envelope AS (
      |  SELECT
      |    'persistent://public/default/events' AS topic,
      |    CAST(user_id % 4 AS INT) AS partition,
      |    event_id AS "offset",
      |    0 AS batch_index,
      |    CAST(user_id AS VARCHAR) AS key,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE props END AS value,
      |    'p' || CAST(user_id % 4 AS VARCHAR) AS producer_name,
      |    CASE WHEN event_id % 10 = 0 THEN event_id - 1 ELSE event_id END AS sequence_id,
      |    ts AS publish_time,
      |    ts AS event_time,
      |    event_type,
      |    value AS metric_value,
      |    ts + to_hours(event_id % 7) AS deliver_at,
      |    CAST(event_id % 5 AS INT) AS redelivery_count,
      |    'cluster-' || CAST(event_id % 3 AS VARCHAR) AS replicated_from
      |  FROM ev
      |)""".stripMargin
}

/**
 * Topic name parsing: {persistent|non-persistent}://tenant/namespace/topic.
 * Reference: pulsar-common/.../naming/TopicName.java:34.
 */
final case class TopicName(domain: String, tenant: String, namespace: String, topic: String) {
  require(domain == "persistent" || domain == "non-persistent", s"bad domain: $domain")
  def fqn: String = s"$domain://$tenant/$namespace/$topic"
  /** Path convention for the parquet-backed topic log. Persistent-only:
    * a non-persistent topic HAS no storage (the reference delivers it
    * in-memory to connected consumers and drops the rest,
    * NonPersistentTopic.java) — and because this layout omits the
    * domain, giving one a path would silently SHARE storage and
    * manifest epochs with the same-named persistent topic. */
  def path(root: String): String = {
    require(domain == "persistent",
      s"non-persistent topic $fqn has no storage path (reference: " +
        s"in-memory dispatch only)")
    s"$root/$tenant/$namespace/$topic"
  }
  /** Internal partition topic name, reference TopicName.getPartition. */
  def partition(i: Int): String = s"$fqn-partition-$i"
}

object TopicName {
  private val Re = "(persistent|non-persistent)://([^/]+)/([^/]+)/(.+)".r
  def parse(s: String): TopicName = s match {
    case Re(d, t, ns, tp) => TopicName(d, t, ns, tp)
    case _ if !s.contains("://") =>
      // short name defaults to persistent://public/default/<topic>
      TopicName("persistent", "public", "default", s)
    case _ => throw new IllegalArgumentException(s"invalid topic name: $s")
  }
}
