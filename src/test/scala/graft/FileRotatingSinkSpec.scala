package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.FileRotatingSink
import graft.sources.FileRotatingSink.{Config, PartitionWriter}

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

class FileRotatingSinkSpec extends SparkSpec {

  private def read(p: Path): String = new String(Files.readAllBytes(p), UTF_8)

  private def committedNames(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala.toSeq
      .filter(Files.isRegularFile(_)).map(_.getFileName.toString).sorted

  test("rotation by record count: bounded files, offset-ranged names, separator-joined bodies") {
    val dir = Files.createTempDirectory("frs-rot").toString
    val w = new PartitionWriter(Config(dir, "t", rotationRecords = 10), partition = 2)
    (0 until 25).foreach(i => w.write(s"v$i".getBytes(UTF_8), 100L + i))
    val files = w.close()
    assert(committedNames(dir) === Seq("t-p2-o100-109.txt", "t-p2-o110-119.txt", "t-p2-o120-124.txt"))
    val tail = files.find(_.getFileName.toString.endsWith("o120-124.txt")).get
    assert(read(tail) === (20 until 25).map(i => s"v$i\n").mkString)
    // tmp dir drained — every record committed
    assert(Files.list(Paths.get(dir, "tmp")).iterator().asScala.isEmpty)
  }

  test("rotation by interval: fake clock triggers an age-based commit") {
    val dir = Files.createTempDirectory("frs-age").toString
    var now = 1000L
    val w = new PartitionWriter(
      Config(dir, "t", rotationRecords = 1000, rotationIntervalMs = 500), 0, () => now)
    w.write("a".getBytes(UTF_8), 0L)
    w.write("b".getBytes(UTF_8), 1L)
    now += 600 // exceed the age on the next write
    w.write("c".getBytes(UTF_8), 2L)
    w.write("d".getBytes(UTF_8), 3L)
    w.close(): Unit
    assert(committedNames(dir) === Seq("t-p0-o0-2.txt", "t-p0-o3-3.txt"))
  }

  test("maxPendingRecords forces durable syncs before rotation (hsync->ack)") {
    val dir = Files.createTempDirectory("frs-sync").toString
    val w = new PartitionWriter(
      Config(dir, "t", rotationRecords = 100, maxPendingRecords = 5), 0)
    (0 until 17).foreach(i => w.write("x".getBytes(UTF_8), i.toLong))
    assert(w.syncs === 3, "17 records / cap 5 = 3 forced syncs pre-rotation")
    w.close(): Unit
    assert(w.syncs === 4, "rotation adds the final commit sync")
  }

  test("null value writes an empty slot; abort drops only the uncommitted tmp file") {
    val dir = Files.createTempDirectory("frs-null").toString
    val w = new PartitionWriter(Config(dir, "t", rotationRecords = 3), 1)
    w.write("a".getBytes(UTF_8), 0L)
    w.write(null, 1L) // tombstone
    w.write("c".getBytes(UTF_8), 2L) // rotates
    w.write("dangling".getBytes(UTF_8), 3L)
    w.abort()
    assert(committedNames(dir) === Seq("t-p1-o0-2.txt"))
    assert(read(Paths.get(dir, "t-p1-o0-2.txt")) === "a\n\nc\n")
    assert(Files.list(Paths.get(dir, "tmp")).iterator().asScala.isEmpty)
  }

  test("regex-special separators split literally on read-back") {
    val dir = Files.createTempDirectory("frs-sep").toString
    val cfg = Config(dir, "t", separator = '|', rotationRecords = 10)
    val w = new PartitionWriter(cfg, 0)
    w.write("a.b".getBytes(UTF_8), 0L)
    w.write("c".getBytes(UTF_8), 1L)
    w.close(): Unit
    val back = FileRotatingSink.readBack(spark, cfg)
      .orderBy("offset").collect().map(r => (r.getLong(1), r.getString(2)))
    assert(back.toSeq === Seq((0L, "a.b"), (1L, "c")))
  }

  test("config validation") {
    intercept[IllegalArgumentException](Config("/x", ""))
    intercept[IllegalArgumentException](Config("/x", "t", rotationRecords = 0))
    intercept[IllegalArgumentException](Config("/x", "t", rotationIntervalMs = 0))
    intercept[IllegalArgumentException](Config("/x", "t", maxPendingRecords = 0))
  }

  private def buildTopic(root: String): TopicLog = {
    val topic = new TopicLog(spark, root, TopicName.parse("file-sink-in"), 3)
    import spark.implicits._
    val rows = (0 until 200).map(i =>
      (s"k${i % 7}", if (i % 13 == 0) null else s"""{"i":$i}"""))
    topic.append(rows.toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp())): Unit
    topic
  }

  test("topic -> files -> readBack restores (partition, offset, value) exactly") {
    val dir = Files.createTempDirectory("frs-e2e").toString
    val topic = buildTopic(s"$dir/log")
    val cfg = Config(s"$dir/out", "events", rotationRecords = 16)
    Files.createDirectories(Paths.get(cfg.directory)): Unit
    FileRotatingSink.topicToFileSink(topic, cfg, s"$dir/ckpt").awaitTermination()

    val back = FileRotatingSink.readBack(spark, cfg)
    val expected = topic.read().select(
      col(Envelope.Partition).as("partition"), col(Envelope.Offset).as("offset"),
      // text files read tombstones back as empty strings
      coalesce(col(Envelope.Value), lit("")).as("value"))
    assert(back.count() === 200)
    assert(back.except(expected).isEmpty && expected.except(back).isEmpty)
    // every committed file respects the rotation bound
    committedNames(cfg.directory).foreach { n =>
      val m = "-o(\\d+)-(\\d+)\\.txt$".r.findFirstMatchIn(n).get
      assert(m.group(2).toLong - m.group(1).toLong + 1 <= 16, s"$n over rotation bound")
    }
  }

  test("micro-batch replay overwrites the same files byte-for-byte (idempotent)") {
    val dir = Files.createTempDirectory("frs-replay").toString
    val topic = buildTopic(s"$dir/log")
    val cfg = Config(s"$dir/out", "events", rotationRecords = 32)
    Files.createDirectories(Paths.get(cfg.directory)): Unit
    FileRotatingSink.topicToFileSink(topic, cfg, s"$dir/ckpt1").awaitTermination()
    val first = committedNames(cfg.directory)
      .map(n => n -> read(Paths.get(cfg.directory, n))).toMap
    // fresh checkpoint = full replay of the same committed prefix
    FileRotatingSink.topicToFileSink(topic, cfg, s"$dir/ckpt2").awaitTermination()
    val second = committedNames(cfg.directory)
      .map(n => n -> read(Paths.get(cfg.directory, n))).toMap
    assert(second === first)
  }
}
