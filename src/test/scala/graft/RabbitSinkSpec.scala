package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.RabbitSink

import org.apache.spark.sql.functions._

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class RabbitSinkSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  test("golden frames: method + header + body byte layout") {
    val frames = RabbitSink.publishFrames(1, "ex", "rk", "hi".getBytes(UTF_8),
      frameMax = 4096, persistent = false, mandatory = false)
    assert(hex(frames) ===
      // method: type 1, ch 1, size 13 | 60,40, reserved, "ex", "rk", bits
      "010001" + "0000000d" + "003c" + "0028" + "0000" + "026578" + "02726b" + "00" + "ce" +
      // header: type 2, ch 1, size 14 | 60, weight 0, bodysize 2, flags 0
      "020001" + "0000000e" + "003c" + "0000" + "0000000000000002" + "0000" + "ce" +
      // body: type 3, ch 1, size 2 | "hi"
      "030001" + "00000002" + "6869" + "ce")
    // persistent: flag bit 12 set + delivery-mode octet 2
    val p = RabbitSink.publishFrames(1, "ex", "rk", "hi".getBytes(UTF_8),
      frameMax = 4096, persistent = true, mandatory = false)
    assert(hex(p).contains("003c" + "0000" + "0000000000000002" + "1000" + "02" + "ce"))
    // zero-length body: no body frame, header advertises size 0
    val z = RabbitSink.publishFrames(1, "ex", "rk", Array.emptyByteArray,
      frameMax = 4096, persistent = false, mandatory = false)
    assert(!hex(z).drop(2).contains("030001"))
    intercept[IllegalArgumentException] { RabbitSink.shortStr("x" * 256) }
    intercept[IllegalArgumentException] {
      RabbitSink.publishFrames(1, "e", "r", Array.emptyByteArray, 100, false, false)
    }
  }

  test("frame-max splits the body so no frame exceeds the negotiated size") {
    val body = Array.fill[Byte](10000)(7)
    val frames = RabbitSink.publishFrames(1, "e", "r", body, frameMax = 4096,
      persistent = false, mandatory = false)
    // walk the frames; collect body payload sizes
    val bb = ByteBuffer.wrap(frames)
    val sizes = Seq.newBuilder[(Int, Int)]
    while (bb.hasRemaining) {
      val t = bb.get(); bb.getShort
      val n = bb.getInt
      bb.position(bb.position() + n)
      assert(bb.get() === RabbitSink.FrameEnd)
      sizes += ((t.toInt, n))
    }
    val bodyFrames = sizes.result().filter(_._1 == RabbitSink.FrameBody)
    assert(bodyFrames.map(_._2) === Seq(4088, 4088, 1824)) // 7+4088+1 = 4096
    assert(bodyFrames.map(_._2).sum === 10000)
  }

  test("settle: multiple ack settles every tag below; nack wins over ack") {
    val confirms = Seq((3L, true, false), (4L, false, true)) // ack<=3, nack 4
    val (acked, nacked) = RabbitSink.settle(Seq(1L, 2L, 3L, 4L, 5L), confirms)
    assert(acked === Set(1L, 2L, 3L))
    assert(nacked === Set(4L))
    // a multiple ack arriving after a nack does not resurrect the tag
    val (a2, n2) = RabbitSink.settle(Seq(1L, 2L),
      Seq((1L, false, true), (2L, true, false)))
    assert(a2 === Set(2L))
    assert(n2 === Set(1L))
  }

  test("parseConfirms reads ack and nack method frames, skips others") {
    def confirmFrame(mth: Int, tag: Long, bits: Int): Array[Byte] = {
      val p = ByteBuffer.allocate(2 + 2 + 8 + 1)
      p.putShort(RabbitSink.ClassBasic.toShort).putShort(mth.toShort)
        .putLong(tag).put(bits.toByte)
      RabbitSink.frame(RabbitSink.FrameMethod, 1, p.array())
    }
    val mixed = confirmFrame(RabbitSink.MethodAck, 7L, 1) ++
      RabbitSink.frame(RabbitSink.FrameBody, 1, "noise".getBytes(UTF_8)) ++
      confirmFrame(RabbitSink.MethodNack, 9L, 0)
    assert(RabbitSink.parseConfirms(mixed) ===
      Seq((7L, true, false), (9L, false, true)))
  }

  test("topic -> rabbit: all publishes confirmed, nacked subset republished") {
    val dir = Files.createTempDirectory("rabbit-sink").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("rmq-in"), 1)
    import spark.implicits._
    val rows = (0 until 300).map(i => (s"k${i % 50}", s"v$i"))
    topic.append(rows.toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))

    val capture = Files.createTempDirectory("rabbit-capture").toString
    RabbitSink.topicToRabbitSink(topic, "ex1",
      new RabbitSinkSpec.FakeBroker(capture, flaky = true),
      checkpoint = s"$dir/ckpt", batchSize = 20).awaitTermination()

    val published = Files.list(Paths.get(capture)).iterator().asScala.toSeq
      .map(p => new String(Files.readAllBytes(p), UTF_8))
    // every record published and confirmed (values v0..v299 all present)
    val values = published.flatMap(_.split(',').filter(_.nonEmpty))
    assert(values.toSet === (0 until 300).map(i => s"v$i").toSet)
    // the flaky broker nacked some first-of-batch publishes -> retries
    assert(values.size > 300, "no nack retries observed")
  }
}

object RabbitSinkSpec {
  /** Per-task (= per-channel) fake broker: counts publishes it has seen,
    * acks cumulatively with multiple=true, and when flaky nacks the
    * first publish of every second non-trivial batch (the retry then
    * succeeds). Captures the published BODIES for assertions. */
  final class FakeBroker(captureDir: String, flaky: Boolean)
      extends (Array[Byte] => Array[Byte]) with Serializable {
    private var seen = 0L
    private var calls = 0L

    override def apply(frames: Array[Byte]): Array[Byte] = {
      val bodies = Seq.newBuilder[String]
      var publishes = 0
      val bb = ByteBuffer.wrap(frames)
      while (bb.hasRemaining) {
        val t = bb.get(); bb.getShort
        val n = bb.getInt
        val payload = new Array[Byte](n)
        bb.get(payload)
        require(bb.get() == RabbitSink.FrameEnd, "bad frame-end")
        val p = ByteBuffer.wrap(payload)
        if (t == RabbitSink.FrameMethod.toByte &&
          p.getShort == RabbitSink.ClassBasic && p.getShort == RabbitSink.MethodPublish)
          publishes += 1
        else if (t == RabbitSink.FrameBody.toByte)
          bodies += new String(payload, UTF_8)
      }
      calls += 1
      val first = seen + 1
      seen += publishes
      java.nio.file.Files.write(
        java.nio.file.Paths.get(captureDir, f"c${System.nanoTime()}%020d.txt"),
        (bodies.result().mkString(",") + ",").getBytes(UTF_8))
      def confirm(mth: Int, tag: Long, bits: Int): Array[Byte] = {
        val p2 = ByteBuffer.allocate(13)
        p2.putShort(RabbitSink.ClassBasic.toShort).putShort(mth.toShort)
          .putLong(tag).put(bits.toByte)
        RabbitSink.frame(RabbitSink.FrameMethod, 1, p2.array())
      }
      if (flaky && calls % 2 == 1 && publishes > 1)
        confirm(RabbitSink.MethodNack, first, 0) ++
          confirm(RabbitSink.MethodAck, seen, 1)
      else confirm(RabbitSink.MethodAck, seen, 1)
    }
  }
}
