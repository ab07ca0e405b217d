package graft.sources

import graft.log.TopicLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQuery

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/**
 * Topic → RabbitMQ sink (reference pulsar-io/rabbitmq/.../RabbitMQSink
 * .java: exchange/routing-key publish). The bug-bearing part is the
 * AMQP 0-9-1 wire encoding and the publisher-confirm bookkeeping (both
 * from the public spec, amqp.org 0-9-1 + the RabbitMQ confirms
 * extension), concrete and tested; the socket is a pluggable
 * `transport: frames => responseFrames`.
 *
 * Frame layout (spec §2.3.5): `[type:octet][channel:short]
 * [size:int32][payload][0xCE]`. A publish is three-plus frames on one
 * channel:
 *
 *  - METHOD (type 1): class 60 basic / method 40 publish, reserved
 *    short, exchange + routing-key as shortstr (len-prefixed, ≤ 255
 *    bytes), mandatory/immediate bits;
 *  - CONTENT HEADER (type 2): class 60, weight 0, body size int64,
 *    property flags (bit 12 = delivery-mode, value 2 = persistent);
 *  - BODY (type 3, repeated): raw bytes split so NO frame exceeds the
 *    negotiated `frameMax` — chunk = frameMax − 8 (7-byte header +
 *    frame-end octet are inside the limit; spec §4.2.3);
 *
 * Publisher confirms: the sink numbers publishes with sequential
 * delivery tags per channel; the broker replies `basic.ack` (60, 80) /
 * `basic.nack` (60, 120) carrying `[tag:int64][bits]` where bit 0 =
 * multiple — an ack with multiple=true settles every tag ≤ tag. Nacked
 * tags are RETRIED as a subset (republished with fresh tags) up to
 * `maxAttempts`, then the microbatch fails and the engine replays it.
 *
 * Scale shape: identical to the other sinks — HW-filtered foreachBatch,
 * repartition by key + offset order (per-key publish order preserved),
 * executors each hold one "channel", transport pluggable.
 */
object RabbitSink {
  val FrameMethod = 1
  val FrameHeader = 2
  val FrameBody = 3
  val FrameEnd = 0xCE.toByte
  val ClassBasic = 60
  val MethodPublish = 40
  val MethodAck = 80
  val MethodNack = 120
  val MinFrameMax = 4096 // spec minimum frame-min-size

  private[graft] def shortStr(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    require(b.length <= 255, s"AMQP shortstr over 255 bytes: '$s'")
    val out = new Array[Byte](1 + b.length)
    out(0) = b.length.toByte
    System.arraycopy(b, 0, out, 1, b.length)
    out
  }

  private[graft] def frame(ftype: Int, channel: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(7 + payload.length + 1)
    bb.put(ftype.toByte).putShort(channel.toShort).putInt(payload.length)
    bb.put(payload).put(FrameEnd)
    bb.array()
  }

  /** The three-plus frames of one basic.publish. */
  private[graft] def publishFrames(channel: Int, exchange: String,
                                   routingKey: String, body: Array[Byte],
                                   frameMax: Int, persistent: Boolean,
                                   mandatory: Boolean): Array[Byte] = {
    require(frameMax >= MinFrameMax, s"frameMax below spec minimum: $frameMax")
    val out = new ByteArrayOutputStream()
    // method: class 60, method 40, reserved, exchange, routing-key, bits
    val ex = shortStr(exchange); val rk = shortStr(routingKey)
    val m = ByteBuffer.allocate(2 + 2 + 2 + ex.length + rk.length + 1)
    m.putShort(ClassBasic.toShort).putShort(MethodPublish.toShort)
      .putShort(0.toShort).put(ex).put(rk)
      .put((if (mandatory) 1 else 0).toByte)
    out.write(frame(FrameMethod, channel, m.array()))
    // content header: class, weight, body size, property flags (+ props)
    val flags = if (persistent) 1 << 12 else 0
    val h = ByteBuffer.allocate(2 + 2 + 8 + 2 + (if (persistent) 1 else 0))
    h.putShort(ClassBasic.toShort).putShort(0.toShort)
      .putLong(body.length.toLong).putShort(flags.toShort)
    if (persistent) h.put(2.toByte) // delivery-mode property
    out.write(frame(FrameHeader, channel, h.array()))
    // body frames: the WHOLE frame must fit frameMax -> chunk = max - 8
    val chunk = frameMax - 8
    var off = 0
    while (off < body.length) {
      val n = math.min(chunk, body.length - off)
      out.write(frame(FrameBody, channel, java.util.Arrays.copyOfRange(body, off, off + n)))
      off += n
    }
    if (body.length == 0) () // zero-length body: header's size 0 says it all
    out.toByteArray
  }

  /** Parse broker confirm frames: (deliveryTag, multiple, nack). */
  private[graft] def parseConfirms(response: Array[Byte]): Seq[(Long, Boolean, Boolean)] = {
    val bb = ByteBuffer.wrap(response)
    val out = Seq.newBuilder[(Long, Boolean, Boolean)]
    while (bb.remaining() >= 8) {
      val ftype = bb.get(); bb.getShort // channel
      val size = bb.getInt
      val payload = new Array[Byte](size)
      bb.get(payload)
      require(bb.get() == FrameEnd, "missing AMQP frame-end octet")
      if (ftype == FrameMethod.toByte) {
        val p = ByteBuffer.wrap(payload)
        val cls = p.getShort; val mth = p.getShort
        if (cls == ClassBasic && (mth == MethodAck || mth == MethodNack)) {
          val tag = p.getLong
          val bits = p.get()
          out += ((tag, (bits & 1) != 0, mth == MethodNack))
        }
      }
    }
    out.result()
  }

  /** Resolve a confirm sequence against outstanding tags: returns
    * (settledAcked, nacked). `multiple` settles every tag ≤ tag. */
  private[graft] def settle(outstanding: Seq[Long],
                            confirms: Seq[(Long, Boolean, Boolean)]): (Set[Long], Set[Long]) = {
    var acked = Set.empty[Long]; var nacked = Set.empty[Long]
    confirms.foreach { case (tag, multiple, isNack) =>
      val hit = if (multiple) outstanding.filter(_ <= tag) else outstanding.filter(_ == tag)
      if (isNack) nacked ++= hit else acked ++= hit
    }
    (acked -- nacked, nacked)
  }

  /**
   * Stream the topic into RabbitMQ through `transport: frameBytes =>
   * responseFrameBytes`. Each record publishes to `exchange` with the
   * envelope key as routing key (keyless records route on ""); every
   * publish must be confirmed; nacked publishes retry as a subset.
   */
  def topicToRabbitSink(topic: TopicLog, exchange: String,
                        transport: Array[Byte] => Array[Byte],
                        checkpoint: String,
                        frameMax: Int = 131072,
                        persistent: Boolean = true,
                        batchSize: Int = 100,
                        maxAttempts: Int = 3): StreamingQuery = {
    require(batchSize >= 1 && maxAttempts >= 1, "batchSize/maxAttempts must be >= 1")
    shortStr(exchange): Unit // validate early
    SinkHarness.startKeyed(topic, checkpoint) { rows =>
      flushPartition(rows, exchange, transport, frameMax, persistent,
        batchSize, maxAttempts)
    }
  }

  private def flushPartition(rows: Iterator[Row], exchange: String,
                             transport: Array[Byte] => Array[Byte],
                             frameMax: Int, persistent: Boolean,
                             batchSize: Int, maxAttempts: Int): Unit = {
    var nextTag = 1L
    val buf = new scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]
    def send(): Unit = if (buf.nonEmpty) {
      var pending = buf.toSeq
      var attempt = 0
      while (pending.nonEmpty) {
        attempt += 1
        require(attempt <= maxAttempts,
          s"rabbitmq still nacking ${pending.size} publishes after $maxAttempts attempts")
        val tagged = pending.map { p => val t = nextTag; nextTag += 1; (t, p) }
        val frames = new ByteArrayOutputStream()
        tagged.foreach { case (_, (rk, body)) =>
          frames.write(publishFrames(1, exchange, rk, body, frameMax,
            persistent, mandatory = false))
        }
        val confirms = parseConfirms(transport(frames.toByteArray))
        val (acked, nacked) = settle(tagged.map(_._1), confirms)
        val unconfirmed = tagged.filter { case (t, _) => !acked.contains(t) && !nacked.contains(t) }
        require(unconfirmed.isEmpty,
          s"broker left ${unconfirmed.size} publishes unconfirmed")
        pending = tagged.collect { case (t, p) if nacked.contains(t) => p }
      }
      buf.clear()
    }
    rows.foreach { r =>
      val rk = Option(r.getString(0)).getOrElse("")
      val body = Option(r.getString(1)).getOrElse("").getBytes(UTF_8)
      buf += ((rk, body))
      if (buf.length >= batchSize) send()
    }
    send()
  }
}
