package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.AdxSink

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

class AdxSinkSpec extends SparkSpec {

  test("endpoint mangling is the reference's exact idempotent mapping") {
    assert(AdxSink.ingestionEndpoint("https://c1.kusto.example.net")
      === "https://ingest-c1.kusto.example.net")
    assert(AdxSink.ingestionEndpoint("https://ingest-c1.kusto.example.net")
      === "https://ingest-c1.kusto.example.net")
    assert(AdxSink.queryEndpoint("https://ingest-c1.kusto.example.net")
      === "https://c1.kusto.example.net")
    assert(AdxSink.queryEndpoint("https://c1.kusto.example.net")
      === "https://c1.kusto.example.net")
  }

  test("event JSON carries the ADXPulsarEvent shape with ISO instant") {
    val j = AdxSink.eventJson("k\"1", "v", """{"a":"b"}""", "p0", 7L,
      eventTimeMicros = 1539202764000000L)
    assert(j === """{"key":"k\"1","value":"v","properties":"{\"a\":\"b\"}",""" +
      """"producerName":"p0","sequenceId":7,"eventTime":"2018-10-10T20:19:24Z"}""")
    assert(AdxSink.eventJson(null, null, null, "p", 1L, 0L).startsWith(
      """{"key":null,"value":null,"properties":null,"""))
    assert(new String(AdxSink.multiJson(Seq("{}", "{}")), UTF_8) === "[{},{}]")
  }

  test("status finality: only Failed retries") {
    import AdxSink._
    assert(Seq(Succeeded, Queued, Pending, Skipped, PartiallySucceeded).forall(isFinal))
    assert(!isFinal(Failed))
  }

  private def buildTopic(root: String, n: Int): TopicLog = {
    val topic = new TopicLog(spark, root, TopicName.parse("adx-in"), 2)
    import spark.implicits._
    topic.append((0 until n).map(i => (s"k$i", s"v$i")).toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp())): Unit
    topic
  }

  test("topic -> adx: multijson batches bounded, Failed status retried, all events land") {
    val dir = Files.createTempDirectory("adx").toString
    val topic = buildTopic(s"$dir/log", 120)
    val capture = Files.createTempDirectory("adx-capture").toString
    AdxSink.topicToAdxSink(topic, AdxSinkSpec.flakyIngest(capture),
      checkpoint = s"$dir/ckpt", batchSize = 25,
      sleeper = _ => ()).awaitTermination()

    import scala.jdk.CollectionConverters._
    val all = Files.list(java.nio.file.Paths.get(capture)).iterator().asScala.toSeq
      .map(p => new String(Files.readAllBytes(p), UTF_8))
    all.foreach { b =>
      val n = "\"key\":".r.findAllIn(b).size
      assert(n >= 1 && n <= 25, s"batch of $n events over bound")
      assert(b.startsWith("[") && b.endsWith("]"))
    }
    val keys = all.flatMap(b => "\"key\":\"(k\\d+)\"".r.findAllMatchIn(b).map(_.group(1)))
    assert(keys.toSet === (0 until 120).map(i => s"k$i").toSet)
    // the Failed first answer is re-sent verbatim — its capture shows
    // up as a duplicate body regardless of how tasks were laid out
    assert(all.size > all.distinct.size, "no Failed-status retry was captured")
  }

  test("Skipped is final: never retried, batch moves on") {
    val dir = Files.createTempDirectory("adx2").toString
    val topic = buildTopic(s"$dir/log", 10)
    val capture = Files.createTempDirectory("adx2-capture").toString
    AdxSink.topicToAdxSink(topic, AdxSinkSpec.statusIngest(capture, AdxSink.Skipped),
      checkpoint = s"$dir/ckpt", batchSize = 100).awaitTermination()
    import scala.jdk.CollectionConverters._
    val calls = Files.list(java.nio.file.Paths.get(capture)).iterator().asScala.size
    // ≤ one call per task with rows (1 or 2 depending on layout); a
    // retry loop on Skipped would exhaust attempts and multiply this
    assert(calls >= 1 && calls <= 2, s"Skipped must not retry (saw $calls calls)")
  }

  test("permanent exception fails the stream loudly") {
    val dir = Files.createTempDirectory("adx3").toString
    val topic = buildTopic(s"$dir/log", 5)
    val q = AdxSink.topicToAdxSink(topic, AdxSinkSpec.permanentIngest,
      checkpoint = s"$dir/ckpt")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    assert(ex.toString.contains("bad mapping") || ex.getCause != null,
      "permanent failure must surface")
  }

  test("transient exceptions exhaust maxRetryAttempts then fail") {
    val dir = Files.createTempDirectory("adx4").toString
    val topic = buildTopic(s"$dir/log", 5)
    val capture = Files.createTempDirectory("adx4-capture").toString
    val q = AdxSink.topicToAdxSink(topic, AdxSinkSpec.transientIngest(capture),
      checkpoint = s"$dir/ckpt", maxRetryAttempts = 2, sleeper = _ => ())
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](q.awaitTermination())
    import scala.jdk.CollectionConverters._
    val attempts = Files.list(java.nio.file.Paths.get(capture)).iterator().asScala.size
    // 1 initial + 2 retries for the task that surfaced the failure
    assert(attempts >= 3, s"saw only $attempts attempts")
  }
}

object AdxSinkSpec {
  import java.nio.file.Paths

  private def capture(dir: String, body: Array[Byte]): Unit =
    Files.write(Paths.get(dir, f"b${System.nanoTime()}%020d-t${Thread.currentThread().getId}.json"),
      body): Unit

  /** Fails the first call each task copy sees, then succeeds. */
  def flakyIngest(dir: String): Array[Byte] => AdxSink.Status =
    new (Array[Byte] => AdxSink.Status) with Serializable {
      private var calls = 0L
      override def apply(body: Array[Byte]): AdxSink.Status = {
        capture(dir, body)
        calls += 1
        if (calls == 1) AdxSink.Failed else AdxSink.Succeeded
      }
    }

  def statusIngest(dir: String, s: AdxSink.Status): Array[Byte] => AdxSink.Status =
    new (Array[Byte] => AdxSink.Status) with Serializable {
      override def apply(body: Array[Byte]): AdxSink.Status = { capture(dir, body); s }
    }

  def permanentIngest: Array[Byte] => AdxSink.Status =
    new (Array[Byte] => AdxSink.Status) with Serializable {
      override def apply(body: Array[Byte]): AdxSink.Status =
        throw AdxSink.PermanentIngestException("bad mapping")
    }

  def transientIngest(dir: String): Array[Byte] => AdxSink.Status =
    new (Array[Byte] => AdxSink.Status) with Serializable {
      override def apply(body: Array[Byte]): AdxSink.Status = {
        capture(dir, body)
        throw AdxSink.TransientIngestException("503")
      }
    }
}
