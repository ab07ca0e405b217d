package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.DynamoSink

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class DynamoSinkSpec extends SparkSpec {

  test("request shaping: put items, delete tombstones, escaped strings") {
    val put = DynamoSink.writeReq("k\"1", "hello")
    assert(put.json ===
      """{"PutRequest":{"Item":{"k":{"S":"k\"1"},"v":{"S":"hello"}}}}""")
    val del = DynamoSink.writeReq("k2", null)
    assert(del.json === """{"DeleteRequest":{"Key":{"k":{"S":"k2"}}}}""")
    assert(DynamoSink.request("t1", Seq(del)) ===
      """{"RequestItems":{"t1":[{"DeleteRequest":{"Key":{"k":{"S":"k2"}}}}]}}""")
    // keyless records get the fixed key, like the kinesis sink
    assert(DynamoSink.writeReq(null, "v").key === "0")
    // size accounting: attribute names + values in UTF-8
    assert(put.sizeBytes === 1 + 3 + 1 + 5)
    assert(del.sizeBytes === 1 + 2)
    intercept[IllegalArgumentException] { DynamoSink.checkTableName("t!") }
    intercept[IllegalArgumentException] { DynamoSink.checkTableName("ab") }
  }

  test("unprocessedKeys parses both request shapes in order") {
    assert(DynamoSink.unprocessedKeys("""{"UnprocessedItems":{}}""", "t1") === Nil)
    assert(DynamoSink.unprocessedKeys(
      """{"UnprocessedItems":{"t1":[
        |{"DeleteRequest":{"Key":{"k":{"S":"b"}}}},
        |{"PutRequest":{"Item":{"k":{"S":"a"},"v":{"S":"x"}}}}]}}""".stripMargin,
      "t1") === Seq("b", "a"))
    // another table's unprocessed items are not ours
    assert(DynamoSink.unprocessedKeys(
      """{"UnprocessedItems":{"other":[{"DeleteRequest":{"Key":{"k":{"S":"z"}}}}]}}""",
      "t1") === Nil)
  }

  test("topic -> dynamo: 25-item batches, dup-key early flush, unprocessed subset retry") {
    val dir = Files.createTempDirectory("dynamo-sink").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("dyn-in"), 1)
    import spark.implicits._
    // 200 distinct keys plus an UPDATE for every 10th key -> those keys
    // appear twice; the second occurrence must land in a LATER batch
    val rows = (0 until 200).map(i => (s"k$i", s"v$i")) ++
      (0 until 200 by 10).map(i => (s"k$i", s"v$i-upd"))
    topic.append(rows.toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))

    val capture = Files.createTempDirectory("dynamo-capture").toString
    DynamoSink.topicToDynamoSink(topic, "tbl-1",
      DynamoSinkSpec.flakyTransport(capture, "tbl-1"),
      checkpoint = s"$dir/ckpt").awaitTermination()

    val requests = Files.list(Paths.get(capture)).iterator().asScala.toSeq
      .sortBy(_.getFileName.toString)
      .map(p => new String(Files.readAllBytes(p), UTF_8))
    val keyRe = "\\{\"S\":\"(k\\d+(?:-upd)?)\"\\}".r
    val perReq = requests.map(r => keyRe.findAllMatchIn(r).map(_.group(1)).toSeq)
    assert(perReq.forall(_.size <= 25), s"request over 25 items")
    // no batch may hold the same key twice
    perReq.foreach(ks => assert(ks.distinct.size === ks.size, s"dup key in one batch: $ks"))
    // every key acknowledged at least once; retries mean total > unique
    val allKeys = perReq.flatten
    assert(allKeys.toSet.size === 200)
    assert(allKeys.size > 220, "no unprocessed retries captured")
  }

  test("oversized single item fails loudly") {
    val big = "x" * DynamoSink.MaxItemBytes
    val dir = Files.createTempDirectory("dynamo-sink2").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("dyn-in2"), 1)
    import spark.implicits._
    topic.append(Seq(("k", big)).toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, lit(1L))
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))
    val q = DynamoSink.topicToDynamoSink(topic, "tbl-2",
      DynamoSinkSpec.okTransport, checkpoint = s"$dir/ckpt")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.toString.contains("exceeds 400 KB") ||
      Option(err.getCause).exists(_.toString.contains("exceeds 400 KB")))
  }
}

object DynamoSinkSpec {
  /** Applies everything. */
  val okTransport: String => String = _ => """{"UnprocessedItems":{}}"""

  /** Captures requests; leaves the FIRST item of every second request
    * unprocessed (it succeeds on the subset retry). */
  def flakyTransport(dir: String, table: String): String => String = { req =>
    val file = Paths.get(dir, f"r${System.nanoTime()}%020d.txt")
    Files.write(file, req.getBytes(UTF_8))
    val count = Files.list(Paths.get(dir)).count()
    // both request shapes end with exactly four closing braces
    val items = "\\{\"(?:PutRequest|DeleteRequest)\".*?\\}\\}\\}\\}".r
      .findAllIn(req).toSeq
    if (count % 2 == 1 && items.size > 1)
      s"""{"UnprocessedItems":{"$table":[${items.head}]}}"""
    else """{"UnprocessedItems":{}}"""
  }
}
