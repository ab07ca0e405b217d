package graft.sources

import graft.log.TopicLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/**
 * Topic → Kinesis sink (reference pulsar-io/kinesis/.../KinesisSink.java:
 * producer path — partition key from the record key, payload bytes as
 * the data blob). The substance here is the PutRecords API contract
 * (public AWS Kinesis API reference), which is where the bugs live:
 *
 *  - request shaping: `{"StreamName", "Records":[{"Data": base64,
 *    "PartitionKey"}]}`;
 *  - HARD LIMITS enforced client-side: ≤500 records per request,
 *    ≤1 MiB per record (data + partition key), ≤5 MiB per request —
 *    requests flush early when the next record would breach a limit,
 *    oversized single records fail loudly;
 *  - PARTIAL-FAILURE retry: PutRecords is not atomic — the response
 *    carries `FailedRecordCount` and per-record `ErrorCode`; the retry
 *    resends, per partition key, everything from that key's first
 *    failed index onward (duplicating any later accepted record of the
 *    key rather than reordering it), up to `maxAttempts`, then the
 *    microbatch fails (streaming engine replays it).
 *
 * Scale shape: identical to the other sinks — HW-filtered foreachBatch,
 * repartition by key + offset order (Kinesis orders per partition key
 * within a shard, exactly matching the per-key envelope order), batched
 * requests, executors post in parallel, transport pluggable.
 */
object KinesisSink {
  val MaxRecordsPerRequest = 500
  val MaxRecordBytes: Int = 1 << 20      // 1 MiB: data + partition key
  val MaxRequestBytes: Int = 5 << 20     // 5 MiB per request

  /** Stream-name rules (AWS: [a-zA-Z0-9_.-]{1,128}). */
  private[graft] def checkStreamName(name: String): String = {
    require(name != null && name.nonEmpty && name.length <= 128 &&
      name.matches("[a-zA-Z0-9_.-]+"), s"illegal kinesis stream name '$name'")
    name
  }

  private def jsonEscape(s: String): String = JsonUtil.escape(s)

  /** One record entry; size = RAW data bytes (before base64) + key
    * UTF-8 bytes — the accounting the service applies to the 1 MiB /
    * 5 MiB limits (PutRecords API reference: "up to 1 MiB, including
    * the partition key", measured on the decoded blob). */
  private[graft] final case class Entry(dataB64: String, partitionKey: String,
                                        rawDataBytes: Int) {
    def sizeBytes: Int = rawDataBytes + partitionKey.getBytes(UTF_8).length
    def json: String =
      s"""{"Data":"$dataB64","PartitionKey":"${jsonEscape(partitionKey)}"}"""
  }

  private[graft] def entry(key: String, value: String): Entry = {
    val raw = (if (value == null) "" else value).getBytes(UTF_8)
    Entry(Base64.getEncoder.encodeToString(raw),
      // reference: keyless records get a fixed key; EMPTY counts too —
      // Kinesis requires PartitionKey length >= 1, so an empty-string
      // key would be rejected per-record server-side
      if (key == null || key.isEmpty) "0" else key,
      raw.length)
  }

  private[graft] def request(stream: String, entries: Seq[Entry]): String =
    s"""{"StreamName":"${jsonEscape(stream)}","Records":[${
      entries.map(_.json).mkString(",")}]}"""

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Indices that failed in a PutRecords response (ErrorCode present). */
  private[graft] def failedIndices(response: String): Seq[Int] = {
    val tree = mapper.readTree(response)
    if (tree.path("FailedRecordCount").asInt(0) == 0) Nil
    else {
      val recs = tree.path("Records")
      (0 until recs.size()).filter(i => recs.get(i).has("ErrorCode"))
    }
  }

  /**
   * Stream the topic into Kinesis through `transport: requestJson =>
   * responseJson`. Limits are enforced before the wire; partial
   * failures retry only the failed subset.
   */
  def topicToKinesisSink(topic: TopicLog, stream: String,
                         transport: String => String,
                         checkpoint: String,
                         maxAttempts: Int = 3): StreamingQuery = {
    checkStreamName(stream): Unit
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    SinkHarness.startKeyed(topic, checkpoint) { rows =>
      flushPartition(rows, stream, transport, maxAttempts)
    }
  }

  /** Records to resend after a partial failure. Retrying ONLY the
    * failed subset would republish an earlier record of key K AFTER a
    * later already-accepted record of K — inverting the per-key order
    * this sink promises. Instead resend, per partition key, everything
    * from that key's FIRST failed index onward: later accepted records
    * of the key become duplicates (Kinesis is at-least-once anyway)
    * but never get reordered. */
  private[graft] def retrySubset(pending: Seq[Entry], failed: Seq[Int]): Seq[Entry] =
    if (failed.isEmpty) Nil
    else {
      val firstFailedByKey: Map[String, Int] = failed
        .groupBy(i => pending(i).partitionKey)
        .map { case (k, is) => k -> is.min }
      pending.zipWithIndex.collect {
        case (e, i) if firstFailedByKey.get(e.partitionKey).exists(i >= _) => e
      }
    }

  private def flushPartition(rows: Iterator[Row], stream: String,
                             transport: String => String,
                             maxAttempts: Int): Unit = {
    val buf = new scala.collection.mutable.ArrayBuffer[Entry]
    var bufBytes = 0
    def send(): Unit = if (buf.nonEmpty) {
      var pending = buf.toSeq
      var attempt = 0
      while (pending.nonEmpty) {
        attempt += 1
        require(attempt <= maxAttempts,
          s"kinesis PutRecords still failing ${pending.size} records after $maxAttempts attempts")
        val failed = failedIndices(transport(request(stream, pending)))
        pending = retrySubset(pending, failed)
      }
      buf.clear(); bufBytes = 0
    }
    rows.foreach { r =>
      val e = entry(r.getString(0), r.getString(1))
      require(e.sizeBytes <= MaxRecordBytes,
        s"record for key=${e.partitionKey} exceeds 1 MiB (${e.sizeBytes} bytes)")
      if (buf.length + 1 > MaxRecordsPerRequest || bufBytes + e.sizeBytes > MaxRequestBytes)
        send()
      buf += e; bufBytes += e.sizeBytes
    }
    send()
  }
}
