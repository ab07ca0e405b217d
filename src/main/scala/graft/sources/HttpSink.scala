package graft.sources

import graft.log.TopicLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Topic → HTTP/webhook sink (reference pulsar-io/http/.../HttpSink.java:
 * JSON-serialized records POSTed to a configured endpoint). The
 * bug-bearing parts — batch shaping, status-class handling, retry
 * policy, replay idempotency — are concrete; the socket is a pluggable
 * `transport: (headers, body) => HttpResponse`.
 *
 *  - BODY: NDJSON (one `{"key":…,"value":…}` per line) — the batch
 *    form every webhook consumer ingests; batches bounded by record
 *    count AND bytes;
 *  - STATUS CLASSES (RFC 9110): 2xx = delivered; 408 / 429 / 5xx =
 *    transient, retried with exponential backoff honoring a numeric
 *    `Retry-After` response header when present; any other 4xx is a
 *    PERMANENT error — the microbatch fails loudly (replaying the same
 *    bad payload would loop forever);
 *  - IDEMPOTENCY: every batch carries an `Idempotency-Key` header —
 *    the md5 of the body — STABLE across retries and engine replays,
 *    so an at-least-once redelivery is deduplicable server-side.
 *
 * Scale shape: identical to the other sinks — HW-filtered foreachBatch,
 * repartition by key + offset order, executors post in parallel.
 */
object HttpSink {

  final case class HttpResponse(status: Int, headers: Map[String, String] = Map.empty)

  private def jsonEscape(s: String): String = JsonUtil.escape(s)

  private[graft] def line(key: String, value: String): String = {
    val k = if (key == null) "null" else s""""${jsonEscape(key)}""""
    val v = if (value == null) "null" else s""""${jsonEscape(value)}""""
    s"""{"key":$k,"value":$v}"""
  }

  private[graft] def idempotencyKey(body: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(body)
      .map(b => f"$b%02x").mkString

  private[graft] def isTransient(status: Int): Boolean =
    status == 408 || status == 429 || (status >= 500 && status < 600)

  /** Backoff before retry `attempt` (1-based): base·2^(attempt−1), or
    * the response's numeric Retry-After seconds if larger. */
  private[graft] def backoffMillis(attempt: Int, baseMillis: Long,
                                   retryAfter: Option[String]): Long = {
    val exp = baseMillis << (attempt - 1)
    retryAfter.flatMap(_.trim.toLongOption).map(_ * 1000L) match {
      case Some(ra) => math.max(exp, ra)
      case None => exp
    }
  }

  /**
   * Stream the topic to a webhook through `transport`. `sleeper` is the
   * backoff clock (injectable so specs run instantly).
   */
  def topicToHttpSink(topic: TopicLog,
                      transport: (Map[String, String], Array[Byte]) => HttpResponse,
                      checkpoint: String,
                      batchRecords: Int = 100,
                      batchBytes: Int = 1 << 20,
                      maxAttempts: Int = 3,
                      backoffBaseMillis: Long = 100L,
                      sleeper: Long => Unit = Thread.sleep): StreamingQuery = {
    require(batchRecords >= 1 && batchBytes >= 1 && maxAttempts >= 1,
      "batchRecords/batchBytes/maxAttempts must be >= 1")
    SinkHarness.startKeyed(topic, checkpoint) { rows =>
      flushPartition(rows, transport, batchRecords, batchBytes,
        maxAttempts, backoffBaseMillis, sleeper)
    }
  }

  private def flushPartition(rows: Iterator[Row],
                             transport: (Map[String, String], Array[Byte]) => HttpResponse,
                             batchRecords: Int, batchBytes: Int,
                             maxAttempts: Int, backoffBase: Long,
                             sleeper: Long => Unit): Unit = {
    val buf = new scala.collection.mutable.ArrayBuffer[String]
    var bufBytes = 0
    def send(): Unit = if (buf.nonEmpty) {
      val body = (buf.mkString("\n") + "\n").getBytes(UTF_8)
      val headers = Map(
        "Content-Type" -> "application/x-ndjson",
        "Idempotency-Key" -> idempotencyKey(body)) // stable across retries
      var attempt = 0
      var done = false
      while (!done) {
        attempt += 1
        val resp = transport(headers, body)
        if (resp.status >= 200 && resp.status < 300) done = true
        else if (!isTransient(resp.status))
          throw new IllegalStateException(
            s"webhook rejected batch permanently: HTTP ${resp.status}")
        else if (attempt >= maxAttempts)
          throw new IllegalStateException(
            s"webhook still failing (HTTP ${resp.status}) after $maxAttempts attempts")
        else sleeper(backoffMillis(attempt, backoffBase,
          resp.headers.get("Retry-After")))
      }
      buf.clear(); bufBytes = 0
    }
    rows.foreach { r =>
      val ln = line(r.getString(0), r.getString(1))
      val n = ln.getBytes(UTF_8).length + 1
      if (buf.length + 1 > batchRecords || bufBytes + n > batchBytes) send()
      buf += ln; bufBytes += n
    }
    send()
  }
}
