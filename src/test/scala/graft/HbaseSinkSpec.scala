package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.HbaseSink
import graft.sources.HbaseSink.{Cell, RowPut}

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.Base64

class HbaseSinkSpec extends SparkSpec {

  private def unb64(s: String): String = new String(Base64.getDecoder.decode(s), UTF_8)

  test("cell-set JSON: keys, columns and values base64; multi-row multi-cell") {
    val json = HbaseSink.cellSetJson(Seq(
      RowPut("r1", Seq(Cell("cf", "a", "1".getBytes(UTF_8)),
        Cell("cf", "b", "2".getBytes(UTF_8)))),
      RowPut("r2", Seq(Cell("cf", "a", Array.emptyByteArray)))))
    val keys = """"key":"([^"]+)"""".r.findAllMatchIn(json).map(m => unb64(m.group(1))).toSeq
    assert(keys === Seq("r1", "r2"))
    val cols = """"column":"([^"]+)"""".r.findAllMatchIn(json).map(m => unb64(m.group(1))).toSeq
    assert(cols === Seq("cf:a", "cf:b", "cf:a"))
    assert(json.startsWith("""{"Row":[{"key":"""))
  }

  test("binding: raw single-qualifier mode and POJO-field qualifier mode") {
    assert(HbaseSink.bind("k", "v", "cf", Nil)
      .map(r => (r.rowKey, r.cells.map(c => (c.family, c.qualifier, new String(c.value, UTF_8)))))
      === Some(("k", Seq(("cf", "value", "v")))))
    // declared qualifiers pull fields out of a flat JSON value
    val bound = HbaseSink.bind("k", """{"name":"ada","age":"36","skip":"x"}""",
      "cf", Seq("name", "age", "missing"))
    assert(bound.map(_.cells.map(c => (c.qualifier, new String(c.value, UTF_8))))
      === Some(Seq(("name", "ada"), ("age", "36"))))
    // unbindable records drop alone: keyless, or nothing matches
    assert(HbaseSink.bind(null, "v", "cf", Nil) === None)
    assert(HbaseSink.bind("k", """{"other":"1"}""", "cf", Seq("name")) === None)
    assert(HbaseSink.bind("k", "not json", "cf", Seq("name")) === None)
  }

  private def buildTopic(root: String, n: Int): TopicLog = {
    val topic = new TopicLog(spark, root, TopicName.parse("hbase-in"), 2)
    import spark.implicits._
    topic.append((0 until n).map(i => (s"row$i", s"""{"name":"n$i","age":"$i"}"""))
      .toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp())): Unit
    topic
  }

  test("topic -> hbase: batches bounded, 503 retried, every row lands with its qualifiers") {
    val dir = Files.createTempDirectory("hbase").toString
    val topic = buildTopic(s"$dir/log", 90)
    val capture = Files.createTempDirectory("hbase-capture").toString
    HbaseSink.topicToHbaseSink(topic, HbaseSinkSpec.flakyServer(capture),
      checkpoint = s"$dir/ckpt", family = "cf",
      qualifierNames = Seq("name", "age"), batchSize = 20,
      sleeper = _ => ()).awaitTermination()

    import scala.jdk.CollectionConverters._
    val bodies = Files.list(java.nio.file.Paths.get(capture)).iterator().asScala.toSeq
      .map(p => new String(Files.readAllBytes(p), UTF_8))
    bodies.foreach { b =>
      val n = """"key":""".r.findAllIn(b).size
      assert(n >= 1 && n <= 20, s"batch of $n rows over bound")
    }
    val rows = bodies.flatMap(b =>
      """"key":"([^"]+)"""".r.findAllMatchIn(b).map(m => unb64(m.group(1))))
    assert(rows.toSet === (0 until 90).map(i => s"row$i").toSet)
    assert(bodies.size > bodies.distinct.size || rows.size > 90,
      "no 503 retry captured")
  }

  test("a permanent 4xx fails the stream loudly") {
    val dir = Files.createTempDirectory("hbase2").toString
    val topic = buildTopic(s"$dir/log", 3)
    val q = HbaseSink.topicToHbaseSink(topic, _ => 403,
      checkpoint = s"$dir/ckpt", family = "cf")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](q.awaitTermination())
  }
}

object HbaseSinkSpec {
  import java.nio.file.{Files, Paths}

  /** Captures bodies; 503s the first call each task copy sees. */
  def flakyServer(dir: String): Array[Byte] => Int =
    new (Array[Byte] => Int) with Serializable {
      private var calls = 0L
      override def apply(body: Array[Byte]): Int = {
        Files.write(Paths.get(dir,
          f"b${System.nanoTime()}%020d-t${Thread.currentThread().getId}.json"), body): Unit
        calls += 1
        if (calls == 1) 503 else 200
      }
    }
}
