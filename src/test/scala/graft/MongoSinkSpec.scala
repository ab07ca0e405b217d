package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.MongoSink

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class MongoSinkSpec extends SparkSpec {

  test("document: _id stamped from key; non-object values rejected") {
    assert(MongoSink.document("k1", """{"a": 1}""") ===
      Some("""{"a":1,"_id":"k1"}"""))
    assert(MongoSink.document(null, """{"a": 1}""") === Some("""{"a":1}"""))
    assert(MongoSink.document("k", """[1,2]""") === None)
    assert(MongoSink.document("k", """not json""") === None)
  }

  test("insert/upsert/delete command shaping") {
    assert(MongoSink.insertCommand("c", Seq("""{"a":1}""", """{"b":2}""")) ===
      """{"insert":"c","ordered":false,"documents":[{"a":1},{"b":2}]}""")
    assert(MongoSink.upsertCommand("c", Seq(("k1", """{"a":1,"_id":"k1"}"""))) ===
      """{"update":"c","ordered":true,"updates":[{"q":{"_id":"k1"},"u":{"a":1,"_id":"k1"},"upsert":true}]}""")
    assert(MongoSink.deleteCommand("c", Seq("""x"y""")) ===
      """{"delete":"c","deletes":[{"q":{"_id":"x\"y"},"limit":1}]}""")
  }

  test("collection name validation") {
    intercept[IllegalArgumentException] { MongoSink.checkCollection("a\u0000b") }
    intercept[IllegalArgumentException] { MongoSink.checkCollection("a$b") }
    intercept[IllegalArgumentException] { MongoSink.checkCollection("system.views") }
    intercept[IllegalArgumentException] { MongoSink.checkCollection("") }
    assert(MongoSink.checkCollection("events_v1") === "events_v1")
  }

  test("topic -> mongo: inserts and tombstone deletes in apply order; dup-key replay tolerated") {
    val dir = Files.createTempDirectory("mongo-sink").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("mongo-in"), 2)
    def batch(rows: Seq[(String, String)], seqBase: Long) =
      spark.createDataFrame(rows).toDF(Envelope.Key, Envelope.Value)
        .withColumn(Envelope.ProducerName, lit("p0"))
        .withColumn(Envelope.SequenceId, monotonically_increasing_id() + seqBase)
        .withColumn(Envelope.PublishTime, current_timestamp())
        .withColumn(Envelope.EventTime, current_timestamp())
    topic.append(batch(Seq("a" -> """{"v": 1}""", "b" -> """{"v": 2}"""), 0))
    topic.append(spark.createDataFrame(Seq(Tuple1("a"))).toDF(Envelope.Key)
      .withColumn(Envelope.Value, lit(null).cast("string"))
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, lit(50L))
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))

    val capture = Files.createTempDirectory("mongo-capture").toString
    MongoSink.topicToMongoSink(topic, "events_v1",
      MongoSinkSpec.capturingTransport(capture),
      checkpoint = s"$dir/ckpt").awaitTermination()

    val cmds = Files.list(Paths.get(capture)).iterator().asScala.toSeq
      .sortBy(_.getFileName.toString)
      .flatMap(p => Files.readAllLines(p).asScala)
    // key a: upsert then (later offset) delete — order preserved per
    // key; keyed writes go through the update/upsert command so a later
    // value REPLACES the earlier one instead of bouncing off dup-key
    val aIns = cmds.indexWhere(c => c.startsWith("""{"update"""") && c.contains(""""_id":"a""""))
    val aDel = cmds.indexWhere(c => c.startsWith("""{"delete"""") && c.contains(""""_id":"a""""))
    assert(aIns >= 0 && aDel >= 0 && aIns < aDel, cmds.mkString("\n"))
    assert(cmds.exists(c => c.contains(""""v":2""") && c.contains(""""_id":"b"""")))
  }

  test("writeErrors other than dup-key fail the batch") {
    val dir = Files.createTempDirectory("mongo-sink2").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("mongo-in2"), 1)
    topic.append(spark.createDataFrame(Seq(("k", """{"v": 1}""")))
      .toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, lit(1L))
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))
    val q = MongoSink.topicToMongoSink(topic, "events_v1",
      MongoSinkSpec.failingTransport, checkpoint = s"$dir/ckpt")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.toString.contains("writeErrors") ||
      Option(err.getCause).exists(_.toString.contains("writeErrors")))
  }
}

object MongoSinkSpec {
  def capturingTransport(dir: String): String => String = { cmd =>
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, f"c${System.nanoTime()}%020d.txt"),
      cmd.getBytes(UTF_8))
    """{"ok": 1, "n": 1}"""
  }

  val failingTransport: String => String =
    _ => """{"ok": 1, "writeErrors": [{"index": 0, "code": 121, "errmsg": "Document failed validation"}]}"""
}
