package graft.sources

import graft.log.TopicLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Topic → DynamoDB sink (reference pulsar-io/dynamodb is a SOURCE via
 * the Kinesis adapter; the sink side here mirrors the reference's
 * kinesis sink shape onto the public BatchWriteItem API, which is where
 * the client-side bugs live):
 *
 *  - item shaping: envelope key/value as AttributeValue maps
 *    (`{"k":{"S":...},"v":{"S":...}}`); tombstones (null value) become
 *    `DeleteRequest`s — the same upsert/delete split the jdbc and mongo
 *    sinks apply;
 *  - HARD LIMITS enforced before the wire: ≤25 write requests per
 *    batch, ≤400 KB per item (attribute names + values — the service's
 *    accounting), ≤16 MB per request; oversized single items fail
 *    loudly;
 *  - NO DUPLICATE KEYS in one batch: BatchWriteItem rejects two
 *    requests for the same key in a single call (ValidationException),
 *    so the batch flushes early when an incoming key is already
 *    buffered — with per-key offset ordering this preserves
 *    last-write-wins;
 *  - PARTIAL-FAILURE retry: the response's `UnprocessedItems` carries
 *    the requests the service did not apply; ONLY that subset is
 *    retried (matched back by key — unambiguous because a batch never
 *    holds a key twice), up to `maxAttempts`, then the microbatch fails
 *    and the streaming engine replays it.
 *
 * Scale shape: identical to the other sinks — HW-filtered foreachBatch,
 * repartition by key + offset order, executors post batches in
 * parallel, transport pluggable.
 */
object DynamoSink {
  val MaxItemsPerBatch = 25
  val MaxItemBytes: Int = 400 * 1024
  val MaxRequestBytes: Int = 16 * 1024 * 1024

  /** Table-name rules (AWS: [a-zA-Z0-9_.-]{3,255}). */
  private[graft] def checkTableName(name: String): String = {
    require(name != null && name.length >= 3 && name.length <= 255 &&
      name.matches("[a-zA-Z0-9_.-]+"), s"illegal dynamodb table name '$name'")
    name
  }

  private def jsonEscape(s: String): String = JsonUtil.escape(s)

  /** One write request: a PutRequest, or a DeleteRequest for tombstones.
    * `sizeBytes` follows the service's item accounting — UTF-8 bytes of
    * every attribute NAME plus every attribute VALUE. */
  private[graft] final case class WriteReq(key: String, value: Option[String]) {
    def sizeBytes: Int = {
      val keyBytes = 1 + key.getBytes(UTF_8).length // "k" + key
      value match {
        case Some(v) => keyBytes + 1 + v.getBytes(UTF_8).length // + "v" + value
        case None => keyBytes
      }
    }
    def json: String = value match {
      case Some(v) =>
        s"""{"PutRequest":{"Item":{"k":{"S":"${jsonEscape(key)}"},"v":{"S":"${jsonEscape(v)}"}}}}"""
      case None =>
        s"""{"DeleteRequest":{"Key":{"k":{"S":"${jsonEscape(key)}"}}}}"""
    }
  }

  private[graft] def writeReq(key: String, value: String): WriteReq =
    WriteReq(if (key == null) "0" else key, Option(value))

  private[graft] def request(table: String, reqs: Seq[WriteReq]): String =
    s"""{"RequestItems":{"${jsonEscape(table)}":[${reqs.map(_.json).mkString(",")}]}}"""

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Keys of the unprocessed requests in a BatchWriteItem response —
    * `UnprocessedItems.<table>[*].PutRequest.Item.k.S` or
    * `.DeleteRequest.Key.k.S`. Order is preserved. */
  private[graft] def unprocessedKeys(response: String, table: String): Seq[String] = {
    val arr = mapper.readTree(response).path("UnprocessedItems").path(table)
    (0 until arr.size()).map { i =>
      val n = arr.get(i)
      if (n.has("PutRequest")) n.path("PutRequest").path("Item").path("k").path("S").asText()
      else n.path("DeleteRequest").path("Key").path("k").path("S").asText()
    }
  }

  /**
   * Stream the topic into DynamoDB through `transport: requestJson =>
   * responseJson`. Limits and the unique-key-per-batch rule are enforced
   * before the wire; unprocessed items retry as a subset.
   */
  def topicToDynamoSink(topic: TopicLog, table: String,
                        transport: String => String,
                        checkpoint: String,
                        maxAttempts: Int = 3): StreamingQuery = {
    checkTableName(table): Unit
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    SinkHarness.startKeyed(topic, checkpoint) { rows =>
      flushPartition(rows, table, transport, maxAttempts)
    }
  }

  private def flushPartition(rows: Iterator[Row], table: String,
                             transport: String => String,
                             maxAttempts: Int): Unit = {
    val buf = new scala.collection.mutable.ArrayBuffer[WriteReq]
    val keys = new scala.collection.mutable.HashSet[String]
    var bufBytes = 0
    def send(): Unit = if (buf.nonEmpty) {
      var pending = buf.toSeq
      var attempt = 0
      while (pending.nonEmpty) {
        attempt += 1
        require(attempt <= maxAttempts,
          s"dynamodb BatchWriteItem left ${pending.size} unprocessed after $maxAttempts attempts")
        val retryKeys = unprocessedKeys(transport(request(table, pending)), table).toSet
        pending = pending.filter(r => retryKeys.contains(r.key)) // subset, in order
      }
      buf.clear(); keys.clear(); bufBytes = 0
    }
    rows.foreach { r =>
      val w = writeReq(r.getString(0), r.getString(1))
      require(w.sizeBytes <= MaxItemBytes,
        s"item for key=${w.key} exceeds 400 KB (${w.sizeBytes} bytes)")
      if (buf.length + 1 > MaxItemsPerBatch || bufBytes + w.sizeBytes > MaxRequestBytes ||
        keys.contains(w.key))
        send()
      buf += w; keys += w.key; bufBytes += w.sizeBytes
    }
    send()
  }
}
