package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.KinesisSink

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.Base64
import scala.jdk.CollectionConverters._

class KinesisSinkSpec extends SparkSpec {

  test("request shaping: base64 data + escaped partition key") {
    val e = KinesisSink.entry("k\"1", "hello")
    assert(e.dataB64 === Base64.getEncoder.encodeToString("hello".getBytes(UTF_8)))
    assert(KinesisSink.request("s1", Seq(e)) ===
      s"""{"StreamName":"s1","Records":[{"Data":"${e.dataB64}","PartitionKey":"k\\"1"}]}""")
    // keyless records get the reference's fixed partition key
    assert(KinesisSink.entry(null, "v").partitionKey === "0")
    intercept[IllegalArgumentException] { KinesisSink.checkStreamName("bad stream!") }
  }

  test("failedIndices parses partial-failure responses") {
    assert(KinesisSink.failedIndices(
      """{"FailedRecordCount":0,"Records":[{"SequenceNumber":"1"}]}""") === Nil)
    assert(KinesisSink.failedIndices(
      """{"FailedRecordCount":2,"Records":[
        |{"SequenceNumber":"1"},
        |{"ErrorCode":"ProvisionedThroughputExceededException"},
        |{"SequenceNumber":"2"},
        |{"ErrorCode":"InternalFailure"}]}""".stripMargin) === Seq(1, 3))
  }

  test("topic -> kinesis: batches respect the 500-record limit; flaky records retry as a subset") {
    val dir = Files.createTempDirectory("kinesis-sink").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("kin-in"), 1)
    val rows = (0 until 1200).map(i => (s"k$i", s"v$i"))
    import spark.implicits._
    topic.append(rows.toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))

    val capture = Files.createTempDirectory("kinesis-capture").toString
    KinesisSink.topicToKinesisSink(topic, "stream-1",
      KinesisSinkSpec.flakyTransport(capture),
      checkpoint = s"$dir/ckpt").awaitTermination()

    val requests = Files.list(Paths.get(capture)).iterator().asScala.toSeq
      .sortBy(_.getFileName.toString)
      .map(p => new String(Files.readAllBytes(p), UTF_8))
    val sizes = requests.map(_.split("\"PartitionKey\"").length - 1)
    assert(sizes.forall(_ <= 500), s"request over 500 records: $sizes")
    // every record eventually landed exactly once as a success:
    // total sent - retried duplicates == 1200 unique keys acknowledged
    val allKeys = requests.flatMap(r =>
      "\"PartitionKey\":\"(k\\d+)\"".r.findAllMatchIn(r).map(_.group(1)))
    assert(allKeys.toSet.size === 1200)
    // the flaky transport failed the first record of every odd-indexed
    // request once -> at least one retry request exists that is smaller
    // than a full batch and repeats an already-seen key
    assert(allKeys.size > 1200, "no retries captured — flaky transport never exercised")
  }

  test("record size limits account raw data bytes, not base64 length (ADVICE r5)") {
    // ~900 KiB raw base64-encodes to ~1.2 MB; the service accounts the
    // RAW blob + partition key, so this record is legal and must pass.
    val raw = "x" * (900 * 1024)
    val e = KinesisSink.entry("k", raw)
    assert(e.dataB64.length > KinesisSink.MaxRecordBytes, "base64 form exceeds 1 MiB")
    assert(e.sizeBytes === 900 * 1024 + 1, "sizeBytes must be raw bytes + key bytes")
    assert(e.sizeBytes <= KinesisSink.MaxRecordBytes)
  }

  test("partial-failure retry preserves per-key order (ADVICE r5)") {
    def e(k: String, v: String) = KinesisSink.entry(k, v)
    val pending = Seq(e("a", "a1"), e("b", "b1"), e("a", "a2"), e("c", "c1"))
    // a1 (idx 0) failed while a2 (idx 2) succeeded: retrying only a1
    // would land it AFTER a2. The retry must resend a1 AND a2 in order.
    val retry = KinesisSink.retrySubset(pending, Seq(0))
    assert(retry.map(x => (x.partitionKey, x.dataB64)) ===
      Seq(("a", e("a", "a1").dataB64), ("a", e("a", "a2").dataB64)))
    // untouched keys (b, c) are not resent
    assert(!retry.exists(_.partitionKey == "b"))
    // no failures -> nothing pending
    assert(KinesisSink.retrySubset(pending, Nil) === Nil)
    // failure on the LAST record of a key resends just that record
    assert(KinesisSink.retrySubset(pending, Seq(3)).map(_.partitionKey) === Seq("c"))
  }

  test("oversized single record fails loudly") {
    val big = "x" * (KinesisSink.MaxRecordBytes + 1)
    val dir = Files.createTempDirectory("kinesis-sink2").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("kin-in2"), 1)
    import spark.implicits._
    topic.append(Seq(("k", big)).toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, lit(1L))
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))
    val q = KinesisSink.topicToKinesisSink(topic, "stream-1",
      KinesisSinkSpec.okTransport, checkpoint = s"$dir/ckpt")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.toString.contains("exceeds 1 MiB") ||
      Option(err.getCause).exists(_.toString.contains("exceeds 1 MiB")))
  }
}

object KinesisSinkSpec {
  /** Succeeds everything. */
  val okTransport: String => String = { req =>
    val n = req.split("\"PartitionKey\"").length - 1
    s"""{"FailedRecordCount":0,"Records":[${
      Seq.fill(n)("""{"SequenceNumber":"s"}""").mkString(",")}]}"""
  }

  /** Captures requests; fails the FIRST record of every second request
    * it sees (then succeeds on retry — the retried request is smaller). */
  def flakyTransport(dir: String): String => String = { req =>
    val file = java.nio.file.Paths.get(dir, f"r${System.nanoTime()}%020d.txt")
    java.nio.file.Files.write(file, req.getBytes(UTF_8))
    val n = req.split("\"PartitionKey\"").length - 1
    val count = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count()
    val failFirst = count % 2 == 1 && n > 1
    val records = (0 until n).map { i =>
      if (failFirst && i == 0) """{"ErrorCode":"InternalFailure"}"""
      else """{"SequenceNumber":"s"}"""
    }
    s"""{"FailedRecordCount":${if (failFirst) 1 else 0},"Records":[${records.mkString(",")}]}"""
  }
}
