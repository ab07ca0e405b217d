package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.{InfluxSink, RedisSink}

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** RESP framing / line-protocol encoding + end-to-end topic → sink runs
  * against capturing transports. */
class RedisInfluxSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ---------------- RESP framing ----------------

  test("respCommand frames an array of bulk strings per RESP2") {
    val frame = new String(RedisSink.respCommand(
      Seq("SET".getBytes(UTF_8), "k1".getBytes(UTF_8), "v1".getBytes(UTF_8))), UTF_8)
    assert(frame === "*3\r\n$3\r\nSET\r\n$2\r\nk1\r\n$2\r\nv1\r\n")
  }

  test("respCommand length prefixes are byte lengths, not char counts") {
    val frame = new String(RedisSink.respCommand(
      Seq("GET".getBytes(UTF_8), "kλ".getBytes(UTF_8))), UTF_8)
    // λ is 2 bytes in UTF-8 → $3
    assert(frame === "*2\r\n$3\r\nGET\r\n$3\r\nkλ\r\n")
  }

  test("commandsFor: SET, SET EX, DEL tombstone, keyless skip") {
    def s(bs: Seq[Array[Byte]]) = bs.map(new String(_, UTF_8))
    assert(s(RedisSink.commandsFor("k", "v", None)) ===
      Seq("*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$1\r\nv\r\n"))
    assert(s(RedisSink.commandsFor("k", "v", Some(60L))) ===
      Seq("*5\r\n$3\r\nSET\r\n$1\r\nk\r\n$1\r\nv\r\n$2\r\nEX\r\n$2\r\n60\r\n"))
    assert(s(RedisSink.commandsFor("k", null, None)) ===
      Seq("*2\r\n$3\r\nDEL\r\n$1\r\nk\r\n"))
    assert(RedisSink.commandsFor(null, "v", None) === Nil)
  }

  import RedisInfluxSpec.parsePipeline

  test("topicToRedisSink: SET/DEL land in key order, batched pipelines") {
    val root = tmp("redis-topic")
    val topic = new TopicLog(spark, s"$root/log", TopicName.parse("redis-in"), 2)
    topic.append(spark.createDataFrame(Seq(
      ("a", "1"), ("b", "2"), ("a", "3") // a updated twice: last-write-wins
    )).toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))
    topic.append(spark.createDataFrame(Seq(Tuple1("b"))).toDF(Envelope.Key)
      .withColumn(Envelope.Value, lit(null).cast("string")) // tombstone
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, lit(100L))
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))

    val capture = tmp("redis-capture")
    RedisSink.topicToRedisSink(topic, RedisInfluxSpec.capturingRedisTransport(capture),
      checkpoint = tmp("redis-ckpt")).awaitTermination()

    val lines = Files.list(Paths.get(capture)).iterator().asScala.toSeq
      .flatMap(p => Files.readAllLines(p).asScala)
    // final state per key: a -> SET 3 (after SET 1), b -> DEL after SET 2
    assert(lines.filter(_.startsWith("SET a ")) === Seq("SET a 1", "SET a 3"))
    assert(lines.count(_.startsWith("DEL b")) === 1)
    assert(lines.contains("SET b 2"))
  }

  test("redis reply errors fail the batch") {
    val root = tmp("redis-topic2")
    val topic = new TopicLog(spark, s"$root/log", TopicName.parse("redis-in2"), 1)
    topic.append(spark.createDataFrame(Seq(("k", "v"))).toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, lit(1L))
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))
    val q = RedisSink.topicToRedisSink(topic, RedisInfluxSpec.failingRedisTransport,
      checkpoint = tmp("redis-ckpt2"))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.getMessage.contains("redis command failed") ||
      Option(err.getCause).exists(_.toString.contains("redis command failed")))
  }

  // ---------------- Influx line protocol ----------------

  test("lineProtocol: escaping, typed fields, null handling") {
    val df = Seq((1, "us west", "a=b", 42L, 1.5, "say \"hi\"\\", true, 123456789L))
      .toDF("id", "region", "oddtag", "count", "ratio", "note", "ok", "ts")
    val line = df.select(InfluxSink.lineProtocol(df, "cpu load",
      tags = Seq("region" -> col("region"), "odd" -> col("oddtag")),
      fields = Seq("count" -> col("count"), "ratio" -> col("ratio"),
        "note" -> col("note"), "ok" -> col("ok")),
      tsNanos = col("ts")).as("l")).as[String].head()
    assert(line ===
      """cpu\ load,region=us\ west,odd=a\=b count=42i,ratio=1.5,note="say \"hi\"\\",ok=true 123456789""")
  }

  test("lineProtocol: null tags and null fields are omitted; all-null fields yield null line") {
    val df = Seq((Option.empty[String], Option(7L), 1L),
      (Option("t"), Option.empty[Long], 2L))
      .toDF("tag", "f", "ts")
    val lines = df.select(InfluxSink.lineProtocol(df, "m",
      tags = Seq("tag" -> col("tag")),
      fields = Seq("f" -> col("f")),
      tsNanos = col("ts")).as("l")).as[Option[String]].collect()
    assert(lines(0) === Some("m f=7i 1"))
    assert(lines(1) === None)
  }

  test("topicToInfluxSink: points batch through the transport, 204 accepted") {
    val root = tmp("influx-topic")
    val topic = new TopicLog(spark, s"$root/log", TopicName.parse("influx-in"), 1)
    topic.append(spark.createDataFrame(Seq(
      ("s1", """{"v": 1.5, "n": 3}"""),
      ("s2", """{"v": 2.5}"""),
      ("s3", """not json""")  // malformed → all fields null → dropped
    )).toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn(Envelope.EventTime, col(Envelope.PublishTime)))

    val capture = tmp("influx-capture")
    InfluxSink.topicToInfluxSink(topic, "metrics",
      fieldSpecs = Seq("v" -> "double", "n" -> "long"),
      transport = RedisInfluxSpec.capturingInfluxTransport(capture),
      checkpoint = tmp("influx-ckpt")).awaitTermination()

    val lines = Files.list(Paths.get(capture)).iterator().asScala.toSeq
      .flatMap(p => Files.readAllLines(p).asScala).sorted
    val ns = 1704067200L * 1000000000L
    assert(lines === Seq(
      s"metrics,partition=0,key=s1 v=1.5,n=3i $ns",
      s"metrics,partition=0,key=s2 v=2.5 $ns")) // null field n omitted; s3 dropped
  }
}

/** Serializable fake transports (executor closures must not capture the
  * suite instance). */
object RedisInfluxSpec {

  /** Minimal RESP pipeline parser: splits a pipeline back into commands
    * like a real server would. */
  def parsePipeline(bytes: Array[Byte]): Seq[Seq[String]] = {
    val s = new String(bytes, UTF_8)
    var i = 0
    val cmds = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    while (i < s.length) {
      require(s(i) == '*'); val e1 = s.indexOf("\r\n", i)
      val n = s.substring(i + 1, e1).toInt; i = e1 + 2
      val args = (0 until n).map { _ =>
        require(s(i) == '$'); val e2 = s.indexOf("\r\n", i)
        val len = s.substring(i + 1, e2).toInt
        val arg = s.substring(e2 + 2, e2 + 2 + len); i = e2 + 2 + len + 2
        arg
      }
      cmds += args
    }
    cmds.toSeq
  }

  def capturingRedisTransport(dir: String): Array[Byte] => Seq[String] = { bytes =>
    val cmds = parsePipeline(bytes)
    Files.write(Paths.get(dir, s"p${System.nanoTime()}.txt"),
      cmds.map(_.mkString(" ")).mkString("\n").getBytes(UTF_8))
    cmds.map(c => if (c.head == "DEL") ":1" else "+OK")
  }

  val failingRedisTransport: Array[Byte] => Seq[String] =
    bytes => parsePipeline(bytes).map(_ => "-ERR OOM command not allowed")

  def capturingInfluxTransport(dir: String): String => Int = { body =>
    Files.write(Paths.get(dir, s"b${System.nanoTime()}.txt"), body.getBytes(UTF_8))
    204
  }
}
