package graft.sources

import graft.log.TopicLog
import graft.model.Envelope

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Topic → Azure Data Explorer (Kusto) sink (reference
 * `pulsar-io/azure-data-explorer/.../ADXSink.java:66`): records buffer
 * to `batchSize`, each flush serializes the batch as MULTIJSON
 * `ADXPulsarEvent`s (`ADXPulsarEvent.java:24` — key, value, properties,
 * producerName, sequenceId, eventTime) and streams it to the cluster's
 * INGEST endpoint (`ADXSinkUtils.java:25` — `https://c` ↔
 * `https://ingest-c` prefix mangling). Retry contract
 * (`ADXSink.java:125-174`): a `Failed` streaming status or a transient
 * service exception backs off and retries up to `maxRetryAttempts`;
 * permanent data exceptions fail the batch loudly;
 * Succeeded/Queued/Pending are success, and Skipped/PartiallySucceeded
 * are FINAL — logged, never retried (`hasStreamingSucceeded`,
 * ADXSink.java:180).
 *
 * Scale shape: HW-filtered micro-batches via [[SinkHarness]], executors
 * ingest partitions in parallel; replay convergence — each event
 * carries its (producerName, sequenceId), ADX-side dedup by those
 * columns is the documented at-least-once recovery.
 */
object AdxSink {

  /** `ADXSinkUtils.getIngestionEndpoint`: idempotent `ingest-` prefix
    * insertion after the protocol. */
  private[graft] def ingestionEndpoint(clusterUrl: String): String =
    if (clusterUrl.contains("ingest-")) clusterUrl
    else clusterUrl.replaceFirst("://", "://ingest-")

  /** `ADXSinkUtils.getQueryEndpoint`: the inverse mapping. */
  private[graft] def queryEndpoint(clusterUrl: String): String =
    if (clusterUrl.contains("ingest-")) clusterUrl.replaceFirst("ingest-", "")
    else clusterUrl

  /** Streaming-ingest outcome statuses (IngestionStatus.status). */
  sealed trait Status
  case object Succeeded extends Status
  case object Queued extends Status
  case object Pending extends Status
  case object Skipped extends Status
  case object PartiallySucceeded extends Status
  case object Failed extends Status

  /** `hasStreamingSucceeded` (ADXSink.java:180): everything but Failed
    * is final — Skipped/PartiallySucceeded warn but never retry. */
  private[graft] def isFinal(s: Status): Boolean = s != Failed

  /** Transport-level exception classes mirroring the Kusto client's
    * split: transient service trouble retries, permanent data problems
    * and client/URI errors fail loudly. */
  final case class TransientIngestException(msg: String) extends RuntimeException(msg)
  final case class PermanentIngestException(msg: String) extends RuntimeException(msg)

  private def jsonStr(s: String): String =
    if (s == null) "null" else "\"" + JsonUtil.escape(s) + "\""

  /** One ADXPulsarEvent as JSON; `eventTime` serializes as an ISO-8601
    * instant (the Jackson JavaTimeModule wire form). */
  private[graft] def eventJson(key: String, value: String, properties: String,
                               producerName: String, sequenceId: Long,
                               eventTimeMicros: Long): String = {
    val instant = java.time.Instant.EPOCH.plusNanos(eventTimeMicros * 1000L)
    s"""{"key":${jsonStr(key)},"value":${jsonStr(value)},""" +
      s""""properties":${jsonStr(properties)},""" +
      s""""producerName":${jsonStr(producerName)},"sequenceId":$sequenceId,""" +
      s""""eventTime":"$instant"}"""
  }

  /** MULTIJSON batch body: a JSON array of events (ADXSink.java:147
    * `writeValueAsBytes(eventsToSink)` with DataFormat.MULTIJSON). */
  private[graft] def multiJson(events: Seq[String]): Array[Byte] =
    events.mkString("[", ",", "]").getBytes(UTF_8)

  /**
   * Stream the topic into ADX through `ingest: body => Status`.
   * `sleeper` injects the backoff clock.
   */
  def topicToAdxSink(topic: TopicLog,
                     ingest: Array[Byte] => Status,
                     checkpoint: String,
                     batchSize: Int = 100,
                     maxRetryAttempts: Int = 3,
                     retryBackOffTimeMs: Long = 100L,
                     sleeper: Long => Unit = Thread.sleep(_)): StreamingQuery = {
    require(batchSize >= 1, "batchSize must be >= 1")
    SinkHarness.start(topic, checkpoint) { committed =>
      // properties is an optional envelope column (partial appends omit it)
      val props =
        if (committed.columns.contains(Envelope.Properties))
          to_json(col(Envelope.Properties))
        else lit(null).cast("string")
      committed
        .select(col(Envelope.Partition), col(Envelope.Offset), col(Envelope.Key),
          col(Envelope.Value), props.as("props"),
          col(Envelope.ProducerName), col(Envelope.SequenceId),
          // unix_micros, NOT cast("long"): casting a timestamp to long
          // yields epoch SECONDS, and eventJson consumes MICROS — the
          // bare cast shipped every event with a 1970-adjacent
          // timestamp (off by 1e6). Same shape as InfluxSink's line
          // protocol timestamp.
          unix_micros(col(Envelope.EventTime)).as("event_us"))
        .repartition(col(Envelope.Partition))
        .sortWithinPartitions(col(Envelope.Offset))
        .drop(Envelope.Partition, Envelope.Offset)
        .rdd.foreachPartition { rows =>
          rows.grouped(batchSize).foreach { chunk =>
            val events = chunk.map { r: Row =>
              eventJson(
                key = if (r.isNullAt(0)) null else r.getString(0),
                value = if (r.isNullAt(1)) null else r.getString(1),
                properties = if (r.isNullAt(2)) null else r.getString(2),
                producerName = if (r.isNullAt(3)) null else r.getString(3),
                sequenceId = r.getLong(4),
                eventTimeMicros = if (r.isNullAt(5)) 0L else r.getLong(5))
            }
            val body = multiJson(events)
            var attempt = 0
            var done = false
            while (!done) {
              val outcome =
                try Right(ingest(body))
                catch {
                  case t: TransientIngestException => Left(t)
                  case t: PermanentIngestException =>
                    throw new IllegalStateException(
                      s"permanent ADX ingest failure: ${t.msg}", t)
                }
              outcome match {
                case Right(s) if isFinal(s) => done = true
                case _ => // Failed status or transient exception → backoff
                  attempt += 1
                  if (attempt > maxRetryAttempts)
                    throw new IllegalStateException(
                      s"ADX ingest failed after $maxRetryAttempts retries")
                  sleeper(retryBackOffTimeMs)
              }
            }
          }
        }
    }
  }
}
