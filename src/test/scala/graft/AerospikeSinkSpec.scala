package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.AerospikeSink
import graft.sources.AerospikeSink.Ripemd160

import org.apache.spark.sql.functions._

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

class AerospikeSinkSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  test("RIPEMD-160 matches the published test vectors") {
    assert(hex(Ripemd160.digest(Array.emptyByteArray))
      === "9c1185a5c5e9fc54612808977ee8f548b2258d31")
    assert(hex(Ripemd160.digest("a".getBytes(UTF_8)))
      === "0bdc9d2d256b3ee9daae347be6f4dc835a467ffe")
    assert(hex(Ripemd160.digest("abc".getBytes(UTF_8)))
      === "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc")
    assert(hex(Ripemd160.digest("message digest".getBytes(UTF_8)))
      === "5d0689ef49d2fae572b881b123a85ffa21595f36")
    assert(hex(Ripemd160.digest("abcdefghijklmnopqrstuvwxyz".getBytes(UTF_8)))
      === "f71c27109c692c1b56bbdceb5b9d2865b3708dbc")
    // exercise the multi-block path (> 64 bytes)
    assert(hex(Ripemd160.digest(("a" * 1000).getBytes(UTF_8))).length === 40)
  }

  test("key digest = ripemd160(set ++ particle type ++ key)") {
    val expect = Ripemd160.digest(
      "demo".getBytes(UTF_8) ++ Array(3.toByte) ++ "user1".getBytes(UTF_8))
    assert(AerospikeSink.keyDigest("demo", "user1").toSeq === expect.toSeq)
    assert(AerospikeSink.keyDigest("demo", "user1").length === 20)
  }

  test("put message: proto header, message header, fields and the write op decode back") {
    val msg = AerospikeSink.putMessage("ns1", "set1", "k9", "value", "hello".getBytes(UTF_8),
      expirationSecs = 3600)
    val buf = ByteBuffer.wrap(msg)
    val proto = buf.getLong
    assert((proto >>> 56) === 2L, "protocol version 2")
    assert(((proto >>> 48) & 0xff) === 3L, "message type AS_MSG")
    assert((proto & 0xffffffffffffL) === (msg.length - 8).toLong, "48-bit body size")
    assert(buf.get() === 22.toByte) // header size
    assert(buf.get() === 0.toByte) // info1
    assert(buf.get() === 1.toByte) // info2 = WRITE
    buf.get(); buf.get(); buf.get() // info3, unused, result code
    assert(buf.getInt === 0) // generation
    assert(buf.getInt === 3600) // ttl
    buf.getInt // transaction ttl
    assert(buf.getShort === 3.toShort) // ns + set + digest
    assert(buf.getShort === 1.toShort) // one op
    def field(): (Int, Array[Byte]) = {
      val sz = buf.getInt
      val t = buf.get() & 0xff
      val d = new Array[Byte](sz - 1)
      buf.get(d)
      (t, d)
    }
    val (t0, ns) = field()
    assert(t0 === 0 && new String(ns, UTF_8) === "ns1")
    val (t1, set) = field()
    assert(t1 === 1 && new String(set, UTF_8) === "set1")
    val (t4, digest) = field()
    assert(t4 === 4 && digest.toSeq === AerospikeSink.keyDigest("set1", "k9").toSeq)
    val opSz = buf.getInt
    assert(buf.get() === 2.toByte, "WRITE op")
    assert(buf.get() === 4.toByte, "blob particle")
    buf.get() // bin version
    val nameLen = buf.get() & 0xff
    val name = new Array[Byte](nameLen); buf.get(name)
    assert(new String(name, UTF_8) === "value")
    val v = new Array[Byte](opSz - 4 - nameLen); buf.get(v)
    assert(new String(v, UTF_8) === "hello")
    assert(buf.remaining() === 0, "nothing after the op")
  }

  test("bin names cap at 15 bytes, like the server limit") {
    intercept[IllegalArgumentException](
      AerospikeSink.putMessage("ns", "s", "k", "a-very-long-bin-name", Array[Byte]()))
  }

  private def buildTopic(root: String, n: Int): TopicLog = {
    val topic = new TopicLog(spark, root, TopicName.parse("aero-in"), 2)
    import spark.implicits._
    topic.append((0 until n).map(i => (s"k$i", if (i % 9 == 0) null else s"v$i"))
      .toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp())): Unit
    topic
  }

  test("topic -> aerospike: every record lands as a put, timeouts retry, digest addressable") {
    val dir = Files.createTempDirectory("aero").toString
    val topic = buildTopic(s"$dir/log", 60)
    val capture = Files.createTempDirectory("aero-capture").toString
    AerospikeSink.topicToAerospikeSink(topic,
      AerospikeSinkSpec.flakyServer(capture),
      checkpoint = s"$dir/ckpt", namespace = "ns", keySet = "events",
      columnName = "v", sleeper = _ => ()).awaitTermination()

    import scala.jdk.CollectionConverters._
    val msgs = Files.list(java.nio.file.Paths.get(capture)).iterator().asScala.toSeq
      .map(Files.readAllBytes)
    // every record's put present; the flaky timeout shows up as ≥1
    // duplicate resend (count depends on task layout)
    assert(msgs.map(hex).distinct.size === 60)
    assert(msgs.size > 60, s"no timeout retry captured (${msgs.size} messages)")
    // tombstone (null value) wrote an empty blob, not a dropped record
    val k0 = AerospikeSink.putMessage("ns", "events", "k0", "v", Array.emptyByteArray)
    assert(msgs.map(_.toSeq).contains(k0.toSeq), "k0 empty-blob put missing")
  }

  test("a non-retryable result code fails the stream loudly") {
    val dir = Files.createTempDirectory("aero2").toString
    val topic = buildTopic(s"$dir/log", 3)
    val q = AerospikeSink.topicToAerospikeSink(topic,
      _ => AerospikeSinkSpec.response(2 /* KEY_NOT_FOUND-ish */),
      checkpoint = s"$dir/ckpt", namespace = "ns", keySet = "s", columnName = "v")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](q.awaitTermination())
  }
}

object AerospikeSinkSpec {
  import java.nio.file.{Files, Paths}

  def response(code: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + 22)
    b.putLong((2L << 56) | (3L << 48) | 22L)
    b.put(22.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.put(code.toByte)
    b.array()
  }

  /** Captures every message; times out the first call each task copy
    * sees (the resend then succeeds). */
  def flakyServer(dir: String): Array[Byte] => Array[Byte] =
    new (Array[Byte] => Array[Byte]) with Serializable {
      private var calls = 0L
      override def apply(msg: Array[Byte]): Array[Byte] = {
        Files.write(Paths.get(dir,
          f"m${System.nanoTime()}%020d-t${Thread.currentThread().getId}.bin"), msg): Unit
        calls += 1
        if (calls == 1) response(AerospikeSink.ResultTimeout) else response(0)
      }
    }
}
