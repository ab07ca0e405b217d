package graft.sources

import graft.log.TopicLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Topic → Solr sink (reference pulsar-io/solr/.../SolrAbstractSink.java:
 * document-per-record indexing with an id field). The bug-bearing part
 * is Solr's JSON update command stream (public Solr ref guide,
 * "Uploading Data with Index Handlers"):
 *
 *  - one request body is a JSON OBJECT WITH REPEATED KEYS —
 *    `{"add":{…},"add":{…},"delete":{"id":…}}` — which standard JSON
 *    builders reject; order between adds and deletes is significant and
 *    preserved, so the stream is assembled by hand;
 *  - each `add` carries `"commitWithin"` (ms) and its `"doc"` map; a
 *    tombstone (null value) becomes `delete` by id;
 *  - the response's `responseHeader.status` is 0 on success; 503 is
 *    retried (bounded), anything else non-zero fails the microbatch
 *    loudly (a malformed update replayed forever would loop).
 *
 * Scale shape: identical to the other sinks — HW-filtered foreachBatch,
 * repartition by key + offset order (last-write-wins per id under
 * replay; add/delete are idempotent by id), `batchSize` commands per
 * POST, transport pluggable.
 */
object SolrSink {

  private def jsonEscape(s: String): String = JsonUtil.escape(s)

  /** One command in the update stream: `"add":{…}` or `"delete":{…}`.
    * Keyless records are skipped (Solr requires the unique id). */
  private[graft] def command(key: String, value: String,
                             commitWithinMs: Long): Option[String] =
    Option(key).map { k =>
      if (value == null)
        s""""delete":{"id":"${jsonEscape(k)}"}"""
      else
        s""""add":{"commitWithin":$commitWithinMs,"doc":{"id":"${jsonEscape(k)}","value_s":"${jsonEscape(value)}"}}"""
    }

  /** The repeated-key JSON object Solr's update handler expects. */
  private[graft] def requestBody(commands: Seq[String]): String =
    commands.mkString("{", ",", "}")

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private[graft] def responseStatus(response: String): Int =
    mapper.readTree(response).path("responseHeader").path("status").asInt(-1)

  /**
   * Stream the topic into Solr through `transport: requestBody =>
   * responseBody` (the POST to `/update`).
   */
  def topicToSolrSink(topic: TopicLog,
                      transport: String => String,
                      checkpoint: String,
                      commitWithinMs: Long = 1000L,
                      batchSize: Int = 100,
                      maxAttempts: Int = 3,
                      retryBackoffMs: Long = 100L,
                      sleeper: Long => Unit = Thread.sleep(_)): StreamingQuery = {
    require(batchSize >= 1 && maxAttempts >= 1 && commitWithinMs >= 0,
      "batchSize/maxAttempts/commitWithinMs out of range")
    SinkHarness.startKeyed(topic, checkpoint) { rows =>
      flushPartition(rows, transport, commitWithinMs, batchSize, maxAttempts,
        retryBackoffMs, sleeper)
    }
  }

  private def flushPartition(rows: Iterator[Row], transport: String => String,
                             commitWithinMs: Long, batchSize: Int,
                             maxAttempts: Int, retryBackoffMs: Long,
                             sleeper: Long => Unit): Unit = {
    val buf = new scala.collection.mutable.ArrayBuffer[String]
    def send(): Unit = if (buf.nonEmpty) {
      val body = requestBody(buf.toSeq)
      var attempt = 0
      var done = false
      while (!done) {
        attempt += 1
        responseStatus(transport(body)) match {
          case 0 => done = true
          case 503 =>
            require(attempt < maxAttempts,
              s"solr update still 503 after $maxAttempts attempts")
            // 503 = overloaded: a sleep-less loop re-slams the server
            // with maxAttempts back-to-back requests in microseconds —
            // the same backoff-and-injectable-clock shape as the
            // Aerospike/HBase retry paths
            sleeper(retryBackoffMs)
          case other =>
            throw new IllegalStateException(
              s"solr update rejected permanently: status $other")
        }
      }
      buf.clear()
    }
    rows.foreach { r =>
      command(r.getString(0), r.getString(1), commitWithinMs).foreach { c =>
        buf += c
        if (buf.length >= batchSize) send()
      }
    }
    send()
  }
}
