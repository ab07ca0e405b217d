package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.concurrent.atomic.AtomicBoolean

/**
 * NSQ source (reference pulsar-io/nsq/.../NSQSource.java:43 — a
 * PushSource subscribing to an NSQ topic+channel and consuming every
 * message body as a record; the reference delegates the protocol to a
 * client library, so the wire layer here derives from the PUBLIC NSQ
 * TCP protocol spec at nsq.io/clients/tcp_protocol_spec, not from
 * reference code).
 *
 * Protocol implemented (V2):
 *  - connect, send the 4-byte magic `"  V2"`;
 *  - `SUB <topic> <channel>\n`, await the `OK` response frame;
 *  - `RDY <n>\n` flow control — the server sends at most n unacked
 *    messages; the client re-arms when its window is half-consumed
 *    (the standard client's strategy);
 *  - frames are `[4-byte big-endian size][4-byte type][data]` with
 *    size counting type+data; type 0 = response, 1 = error,
 *    2 = message;
 *  - message data is `[8-byte ns timestamp][2-byte attempts]
 *    [16-byte hex id][body]`;
 *  - `_heartbeat_` responses answered with `NOP\n` (the server drops
 *    clients that miss two);
 *  - handler verdict → `FIN <id>\n` (acked) or `REQ <id> <deferMs>\n`
 *    (requeued for redelivery with attempts+1);
 *  - `CLS\n` on close, tolerating the `CLOSE_WAIT` response.
 *
 * Delivery is at-least-once (requeue + redelivery), same as the
 * reference source; wire the handler to [[Connectors.PushSource]] to
 * land bodies in a topic.
 */
object NsqSource {

  final case class NsqMessage(id: String, timestampNanos: Long,
                              attempts: Int, body: Array[Byte])

  val FrameResponse = 0
  val FrameError = 1
  val FrameMessage = 2

  /** Topic/channel grammar from the spec: 1–64 chars TOTAL (the
    * `#ephemeral` suffix counts toward the cap, as in nsqd's
    * validator) over `[.a-zA-Z0-9_-]`. */
  private[graft] def checkName(name: String, what: String): String = {
    require(name != null && name.length >= 1 && name.length <= 64 &&
      name.matches("[.a-zA-Z0-9_-]+(#ephemeral)?"),
      s"illegal NSQ $what '$name'")
    name
  }

  /**
   * Subscribe and pump messages into `handler` on a daemon thread.
   * `handler` returning true FINs the message, false REQs it for
   * redelivery after `requeueDeferMs`. A handler THROW also REQs —
   * a poison message must not wedge the reader loop.
   */
  def subscribe(host: String, port: Int, topic: String, channel: String,
                handler: NsqMessage => Boolean,
                maxInFlight: Int = 64,
                requeueDeferMs: Long = 1000L): Subscriber = {
    checkName(topic, "topic"): Unit
    checkName(channel, "channel"): Unit
    require(maxInFlight >= 1, "maxInFlight must be >= 1")
    new Subscriber(host, port, topic, channel, handler, maxInFlight, requeueDeferMs)
  }

  final class Subscriber private[NsqSource](host: String, port: Int,
                                            topic: String, channel: String,
                                            handler: NsqMessage => Boolean,
                                            maxInFlight: Int, requeueDeferMs: Long) {
    private val running = new AtomicBoolean(true)
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), 5000)
    private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    private val out = new BufferedOutputStream(socket.getOutputStream)

    // handshake on the caller's thread so a broken endpoint fails loudly
    // at construction, not silently on the pump thread
    out.write("  V2".getBytes(US_ASCII))
    command(s"SUB $topic $channel")
    awaitOk()
    private var window = maxInFlight
    command(s"RDY $maxInFlight")

    private val pump = new Thread(() => {
      try pumpLoop()
      catch { case _: EOFException | _: java.net.SocketException => () }
    }, s"nsq-source-$topic-$channel")
    pump.setDaemon(true)
    pump.start()

    private def command(line: String): Unit = synchronized {
      out.write((line + "\n").getBytes(US_ASCII))
      out.flush()
    }

    private def readFrame(): (Int, Array[Byte]) = {
      val size = in.readInt()
      require(size >= 4 && size <= 16 * 1024 * 1024, s"bad frame size $size")
      val tpe = in.readInt()
      val data = new Array[Byte](size - 4)
      in.readFully(data)
      (tpe, data)
    }

    private def awaitOk(): Unit = {
      val (tpe, data) = readFrame()
      val text = new String(data, US_ASCII)
      // a heartbeat may beat the OK onto the wire — answer and re-await
      if (tpe == FrameResponse && text == "_heartbeat_") { command("NOP"); awaitOk() }
      else require(tpe == FrameResponse && text == "OK",
        s"SUB rejected: type=$tpe '$text'")
    }

    private def pumpLoop(): Unit = {
      while (running.get()) {
        val (tpe, data) = readFrame()
        tpe match {
          case FrameResponse =>
            if (new String(data, US_ASCII) == "_heartbeat_") command("NOP")
          case FrameError =>
            throw new IllegalStateException(
              s"nsqd error frame: ${new String(data, US_ASCII)}")
          case FrameMessage =>
            val buf = java.nio.ByteBuffer.wrap(data)
            val ts = buf.getLong
            val attempts = buf.getShort & 0xffff
            val idBytes = new Array[Byte](16)
            buf.get(idBytes)
            val body = new Array[Byte](buf.remaining())
            buf.get(body)
            val id = new String(idBytes, US_ASCII)
            val ok = try handler(NsqMessage(id, ts, attempts, body))
                     catch { case scala.util.control.NonFatal(_) => false }
            command(if (ok) s"FIN $id" else s"REQ $id $requeueDeferMs")
            // re-arm at half-window like the standard client: RDY counts
            // down server-side per delivered message
            window -= 1
            if (window <= maxInFlight / 2) {
              window = maxInFlight
              command(s"RDY $maxInFlight")
            }
          case other =>
            throw new IllegalStateException(s"unknown frame type $other")
        }
      }
    }

    def close(): Unit = {
      running.set(false)
      try command("CLS") catch { case _: Exception => () }
      try socket.close() catch { case _: Exception => () }
      pump.join(2000)
    }
  }

  /** Encode one server frame — shared with specs' fake nsqd so both
    * sides of the tests speak the byte-exact layout. */
  private[graft] def frame(tpe: Int, data: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + data.length)
    buf.putInt(4 + data.length).putInt(tpe).put(data)
    buf.array()
  }

  private[graft] def messageFrame(id: String, timestampNanos: Long,
                                  attempts: Int, body: Array[Byte]): Array[Byte] = {
    require(id.length == 16, "nsq message ids are 16 bytes")
    val buf = java.nio.ByteBuffer.allocate(8 + 8 + 2 + 16 + body.length)
    buf.putInt(4 + 8 + 2 + 16 + body.length).putInt(FrameMessage)
      .putLong(timestampNanos).putShort(attempts.toShort)
      .put(id.getBytes(US_ASCII)).put(body)
    buf.array()
  }
}
