package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, InputStream, OutputStream}
import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicBoolean

/**
 * Netty source mapped Spark-first (reference pulsar-io/netty: a socket
 * server pushing every received payload as a record —
 * NettySource.java:37 extends PushSource, NettyServer.java runs one of
 * three listener types, and the per-type handlers each emit one record
 * per unit of input: TCP = one decoded buffer
 * (tcp/NettyTCPServerHandler.java channelRead0 → consume), UDP = one
 * datagram (udp/NettyUDPServerHandler.java), HTTP = one request body
 * (http/NettyHttpServerHandler.java, with 100-continue handling).
 *
 * This implementation is a REAL server (plain java.net on loopback —
 * the same listener/record semantics without the Netty event-loop
 * machinery, which is transport plumbing, not connector semantics):
 *
 *  - TCP: per-connection reader; framing is either `Lines` (records
 *    split on '\n', trailing '\r' stripped — the deterministic framing
 *    every line-oriented emitter uses) or `Chunks` (each read buffer is
 *    one record — the reference's ByteArrayDecoder semantics, where
 *    record boundaries follow TCP segmentation and are NOT
 *    deterministic; offered for parity, documented as such);
 *  - UDP: one datagram = one record (datagrams ARE framed);
 *  - HTTP: one POST/PUT body = one record; `Expect: 100-continue`
 *    answered before the body is read, success answered `204 No
 *    Content`, non-body methods `405`.
 *
 * Received payloads flow into a caller-supplied `consume` callback —
 * wire it to [[Connectors.PushSource]]`.push` to land records in a
 * topic exactly as the reference wires its server to
 * `PushSource.consume`. Delivery is at-least-once with NO content
 * dedup: a socket peer may legitimately send identical payloads and
 * each is a distinct record (the reference behaves identically).
 */
object NettySource {

  sealed trait Mode
  object Mode {
    /** TCP listener, newline-framed records. */
    case object TcpLines extends Mode
    /** TCP listener, one read buffer = one record (reference
      * ByteArrayDecoder parity; boundaries follow segmentation). */
    case object TcpChunks extends Mode
    /** UDP listener, one datagram = one record. */
    case object Udp extends Mode
    /** HTTP listener, one request body = one record. */
    case object Http extends Mode
  }

  /** Max accepted payload (HTTP body / UDP datagram / TCP line). A
    * loud bound beats a silent OOM on a hostile peer. */
  val MaxRecordBytes: Int = 8 * 1024 * 1024

  def start(mode: Mode, consume: Array[Byte] => Unit,
            host: String = "127.0.0.1", port: Int = 0): Server =
    new Server(mode, consume, host, port)

  final class Server private[NettySource](mode: Mode,
                                          consume: Array[Byte] => Unit,
                                          host: String, port: Int) {
    private val running = new AtomicBoolean(true)
    private val workers = new CopyOnWriteArrayList[Thread]()
    private val clients = new CopyOnWriteArrayList[Socket]()

    private val (tcpSocket, udpSocket) = mode match {
      case Mode.Udp =>
        val s = new DatagramSocket(new InetSocketAddress(host, port))
        (None, Some(s))
      case _ =>
        val s = new ServerSocket()
        s.bind(new InetSocketAddress(host, port))
        (Some(s), None)
    }

    /** The actual bound port (ephemeral when `port = 0`). */
    val boundPort: Int =
      tcpSocket.map(_.getLocalPort).orElse(udpSocket.map(_.getLocalPort)).get

    private val acceptor = new Thread(() => mode match {
      case Mode.Udp => udpLoop()
      case _ => acceptLoop()
    }, s"netty-source-$boundPort")
    acceptor.setDaemon(true)
    acceptor.start()

    private def acceptLoop(): Unit = {
      val server = tcpSocket.get
      while (running.get()) {
        try {
          val client = server.accept()
          clients.add(client): Unit
          // lazily declared so the worker can self-remove from the
          // registry in its finally — without that, a long-lived server
          // under connection churn accumulates one dead Thread
          // reference per historical connection (and close() would
          // serially join them all)
          var self: Thread = null
          self = new Thread(() => {
            try handleConnection(client)
            catch { case _: SocketException | _: java.io.EOFException => () }
            finally {
              client.close(); clients.remove(client): Unit
              workers.remove(self): Unit
            }
          }, s"netty-source-conn-$boundPort")
          self.setDaemon(true)
          workers.add(self): Unit
          self.start()
        } catch { case _: SocketException => () /* closed */ }
      }
    }

    private def handleConnection(client: Socket): Unit = {
      val in = new BufferedInputStream(client.getInputStream)
      mode match {
        case Mode.TcpLines => lineLoop(in)
        case Mode.TcpChunks => chunkLoop(in)
        case Mode.Http => httpLoop(in, client.getOutputStream)
        case Mode.Udp => throw new IllegalStateException("udp has no connections")
      }
    }

    private def lineLoop(in: InputStream): Unit = {
      val buf = new ByteArrayOutputStream()
      var b = in.read()
      while (b >= 0 && running.get()) {
        if (b == '\n') {
          val bytes = buf.toByteArray
          // strip trailing \r so CRLF and LF emitters frame identically
          val n = if (bytes.nonEmpty && bytes.last == '\r') bytes.length - 1 else bytes.length
          consume(java.util.Arrays.copyOf(bytes, n))
          buf.reset()
        } else {
          require(buf.size < MaxRecordBytes, s"line exceeds $MaxRecordBytes bytes")
          buf.write(b)
        }
        b = in.read()
      }
      // a final unterminated line is NOT a record (the peer may still be
      // writing it when the connection drops) — same as any line codec
    }

    private def chunkLoop(in: InputStream): Unit = {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0 && running.get()) {
        if (n > 0) consume(java.util.Arrays.copyOf(buf, n))
        n = in.read(buf)
      }
    }

    // Minimal HTTP/1.1 request loop: header block, optional 100-continue,
    // Content-Length body (chunked encoding rejected loudly), keep-alive.
    private def httpLoop(in: InputStream, out: OutputStream): Unit = {
      var keepAlive = true
      while (keepAlive && running.get()) {
        val head = readHead(in)
        if (head == null) return
        val lines = head.split("\r\n")
        val requestLine = lines.head.split(" ")
        val method = requestLine(0).toUpperCase
        val headers = lines.tail.filter(_.contains(":")).map { l =>
          val i = l.indexOf(':')
          l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
        }.toMap
        keepAlive = !headers.get("connection").exists(_.equalsIgnoreCase("close"))
        require(!headers.get("transfer-encoding").exists(_.contains("chunked")),
          "chunked request bodies not supported; send Content-Length")
        val len = headers.get("content-length").map(_.toInt).getOrElse(0)
        require(len <= MaxRecordBytes, s"body exceeds $MaxRecordBytes bytes")
        if (headers.get("expect").exists(_.equalsIgnoreCase("100-continue")))
          out.write("HTTP/1.1 100 Continue\r\n\r\n".getBytes(US_ASCII))
        val body = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val n = in.read(body, off, len - off)
          if (n < 0) throw new java.io.EOFException("body truncated")
          off += n
        }
        if ((method == "POST" || method == "PUT") && len > 0) {
          consume(body)
          out.write("HTTP/1.1 204 No Content\r\n\r\n".getBytes(US_ASCII))
        } else if (method == "POST" || method == "PUT") {
          out.write("HTTP/1.1 204 No Content\r\n\r\n".getBytes(US_ASCII))
        } else {
          out.write(("HTTP/1.1 405 Method Not Allowed\r\nAllow: POST, PUT\r\n" +
            "Content-Length: 0\r\n\r\n").getBytes(US_ASCII))
        }
        out.flush()
      }
    }

    /** Read up to and including the header-terminating CRLFCRLF; null on EOF
      * before any byte (clean keep-alive close). */
    private def readHead(in: InputStream): String = {
      val buf = new ByteArrayOutputStream()
      var state = 0 // consecutive bytes of \r\n\r\n matched
      var b = in.read()
      if (b < 0) return null
      while (b >= 0) {
        buf.write(b)
        state = (state, b) match {
          case (0, '\r') => 1
          case (1, '\n') => 2
          case (2, '\r') => 3
          case (3, '\n') => 4
          case (_, '\r') => 1
          case _ => 0
        }
        if (state == 4) return new String(buf.toByteArray, US_ASCII).stripSuffix("\r\n\r\n")
        require(buf.size < 64 * 1024, "request head exceeds 64 KiB")
        b = in.read()
      }
      throw new java.io.EOFException("connection closed mid-head")
    }

    private def udpLoop(): Unit = {
      val sock = udpSocket.get
      val buf = new Array[Byte](MaxRecordBytes)
      while (running.get()) {
        try {
          val pkt = new DatagramPacket(buf, buf.length)
          sock.receive(pkt)
          consume(java.util.Arrays.copyOfRange(buf, pkt.getOffset,
            pkt.getOffset + pkt.getLength))
        } catch { case _: SocketException => () /* closed */ }
      }
    }

    def close(): Unit = {
      running.set(false)
      tcpSocket.foreach(_.close())
      udpSocket.foreach(_.close())
      clients.forEach(c => try c.close() catch { case _: Exception => () })
      acceptor.join(2000)
      workers.forEach(_.join(2000))
    }
  }

  /** UTF-8 convenience for line-oriented emitters. */
  def utf8(bytes: Array[Byte]): String = new String(bytes, UTF_8)
}
