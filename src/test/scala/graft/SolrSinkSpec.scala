package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.SolrSink

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class SolrSinkSpec extends SparkSpec {

  test("update stream: repeated keys, order preserved, tombstone delete") {
    val cmds = Seq(
      SolrSink.command("a", "v1", 500L),
      SolrSink.command("b", null, 500L),
      SolrSink.command("a", "v2", 500L),
      SolrSink.command(null, "skipped", 500L)).flatten
    assert(SolrSink.requestBody(cmds) ===
      """{"add":{"commitWithin":500,"doc":{"id":"a","value_s":"v1"}},""" +
      """"delete":{"id":"b"},""" +
      """"add":{"commitWithin":500,"doc":{"id":"a","value_s":"v2"}}}""")
    // escaping
    assert(SolrSink.command("k\"1", "v\\2", 1L).get.contains("""\"1"""))
  }

  test("responseStatus parses the Solr response header") {
    assert(SolrSink.responseStatus("""{"responseHeader":{"status":0,"QTime":5}}""") === 0)
    assert(SolrSink.responseStatus("""{"responseHeader":{"status":400}}""") === 400)
    assert(SolrSink.responseStatus("""{}""") === -1)
  }

  test("topic -> solr: batches bounded, 503 retried, all docs land") {
    val dir = Files.createTempDirectory("solr-sink").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("solr-in"), 1)
    import spark.implicits._
    // mix updates and tombstones
    val rows = (0 until 200).map(i => (s"k$i", if (i % 10 == 0) null else s"v$i"))
    topic.append(rows.toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))

    val capture = Files.createTempDirectory("solr-capture").toString
    SolrSink.topicToSolrSink(topic, SolrSinkSpec.flakyServer(capture),
      checkpoint = s"$dir/ckpt", batchSize = 15).awaitTermination()

    val posts = Files.list(Paths.get(capture)).iterator().asScala.toSeq
      .map(p => new String(Files.readAllBytes(p), UTF_8))
    val addRe = "\"add\":".r
    posts.foreach(b => assert(addRe.findAllIn(b).size +
      "\"delete\":".r.findAllIn(b).size <= 15, "batch over 15 commands"))
    val ids = posts.flatMap(b => "\"id\":\"(k\\d+)\"".r.findAllMatchIn(b).map(_.group(1)))
    assert(ids.toSet === (0 until 200).map(i => s"k$i").toSet)
    assert(ids.size > 200, "no 503 retries captured")
    // tombstones travel as deletes
    assert(posts.exists(_.contains("\"delete\":{\"id\":\"k10\"}")))
  }

  test("permanent non-zero status fails loudly") {
    val dir = Files.createTempDirectory("solr-sink2").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("solr-in2"), 1)
    import spark.implicits._
    topic.append(Seq(("k", "v")).toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, lit(1L))
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))
    val q = SolrSink.topicToSolrSink(topic,
      _ => """{"responseHeader":{"status":400}}""", checkpoint = s"$dir/ckpt")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.toString.contains("permanently") ||
      Option(err.getCause).exists(_.toString.contains("permanently")))
  }
}

object SolrSinkSpec {
  /** Captures bodies; 503s the first POST it sees from each partition
    * copy (the retry then succeeds). */
  def flakyServer(dir: String): String => String = new (String => String) with Serializable {
    private var calls = 0L
    override def apply(body: String): String = {
      Files.write(Paths.get(dir, f"s${System.nanoTime()}%020d.txt"),
        body.getBytes(UTF_8))
      calls += 1
      if (calls == 1) """{"responseHeader":{"status":503}}"""
      else """{"responseHeader":{"status":0}}"""
    }
  }
}
