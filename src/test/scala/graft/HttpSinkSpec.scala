package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.HttpSink
import graft.sources.HttpSink.HttpResponse

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class HttpSinkSpec extends SparkSpec {

  test("status classes: 2xx ok, 408/429/5xx transient, other 4xx permanent") {
    assert(!HttpSink.isTransient(200) && !HttpSink.isTransient(201))
    assert(HttpSink.isTransient(408) && HttpSink.isTransient(429))
    assert(HttpSink.isTransient(500) && HttpSink.isTransient(503))
    assert(!HttpSink.isTransient(400) && !HttpSink.isTransient(404) &&
      !HttpSink.isTransient(413))
  }

  test("backoff doubles per attempt; numeric Retry-After wins when larger") {
    assert(HttpSink.backoffMillis(1, 100, None) === 100L)
    assert(HttpSink.backoffMillis(3, 100, None) === 400L)
    assert(HttpSink.backoffMillis(1, 100, Some("2")) === 2000L)
    assert(HttpSink.backoffMillis(6, 100, Some("2")) === 3200L) // exp > ra
    assert(HttpSink.backoffMillis(1, 100, Some("nope")) === 100L)
  }

  test("ndjson lines escape strings, null key/value stay JSON null") {
    assert(HttpSink.line("k\"1", "v\\2") === """{"key":"k\"1","value":"v\\2"}""")
    assert(HttpSink.line(null, null) === """{"key":null,"value":null}""")
  }

  test("topic -> webhook: batches bounded, transient retries reuse the idempotency key") {
    val dir = Files.createTempDirectory("http-sink").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("http-in"), 1)
    import spark.implicits._
    val rows = (0 until 300).map(i => (s"k$i", s"v$i"))
    topic.append(rows.toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))

    val capture = Files.createTempDirectory("http-capture").toString
    HttpSink.topicToHttpSink(topic,
      new HttpSinkSpec.FlakyServer(capture),
      checkpoint = s"$dir/ckpt", batchRecords = 20,
      sleeper = _ => ()).awaitTermination()

    val posts = Files.list(Paths.get(capture)).iterator().asScala.toSeq
      .map(p => new String(Files.readAllBytes(p), UTF_8).split("\n", 2))
    // file layout: first line = idempotency key, rest = body
    val byKey = posts.groupBy(_.head)
    // retried batches resent the SAME body under the SAME idempotency key
    val retried = byKey.filter(_._2.size > 1)
    assert(retried.nonEmpty, "no transient retries captured")
    retried.values.foreach { attempts =>
      assert(attempts.map(_.last).distinct.size === 1,
        "retried batch changed its body under one idempotency key")
    }
    // every record delivered; batches ≤ 20 records
    val delivered = byKey.map(_._2.head.last).toSeq
    delivered.foreach(b => assert(b.trim.split("\n").length <= 20))
    val keys = delivered.flatMap(_.trim.split("\n"))
      .map(l => "\"key\":\"(k\\d+)\"".r.findFirstMatchIn(l).get.group(1))
    assert(keys.toSet === (0 until 300).map(i => s"k$i").toSet)
  }

  test("permanent 4xx fails the stream loudly") {
    val dir = Files.createTempDirectory("http-sink2").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("http-in2"), 1)
    import spark.implicits._
    topic.append(Seq(("k", "v")).toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, lit(1L))
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))
    val q = HttpSink.topicToHttpSink(topic, (_, _) => HttpResponse(400),
      checkpoint = s"$dir/ckpt", sleeper = _ => ())
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.toString.contains("permanently") ||
      Option(err.getCause).exists(_.toString.contains("permanently")))
  }
}

object HttpSinkSpec {
  /** Captures (idempotency key + body) per POST; 503s the first attempt
    * of every second distinct batch it sees, with a Retry-After. */
  final class FlakyServer(captureDir: String)
      extends ((Map[String, String], Array[Byte]) => HttpResponse) with Serializable {
    private val failed = scala.collection.mutable.HashSet[String]()
    private var batches = 0L

    override def apply(headers: Map[String, String], body: Array[Byte]): HttpResponse = {
      val key = headers("Idempotency-Key")
      require(headers("Content-Type") == "application/x-ndjson")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(captureDir, f"p${System.nanoTime()}%020d.txt"),
        (key + "\n" + new String(body, UTF_8)).getBytes(UTF_8))
      if (!failed.contains(key)) {
        batches += 1
        if (batches % 2 == 1) {
          failed += key
          return HttpResponse(503, Map("Retry-After" -> "0"))
        }
      }
      HttpResponse(200)
    }
  }
}
