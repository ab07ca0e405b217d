package graft

import graft.sources.NsqSource

import java.io.{BufferedInputStream, InputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

/** Drives [[NsqSource]] against a protocol-faithful fake nsqd speaking
  * the public V2 TCP framing (magic, SUB/RDY/FIN/REQ/NOP lines from the
  * client; size+type framed responses/messages from the server). */
class NsqSourceSpec extends SparkSpec {

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var b = in.read()
    while (b >= 0 && b != '\n') { sb.append(b.toChar); b = in.read() }
    if (b < 0 && sb.isEmpty) null else sb.toString
  }

  private def expectMagic(in: InputStream): Unit = {
    val magic = new Array[Byte](4)
    var off = 0
    while (off < 4) {
      val n = in.read(magic, off, 4 - off)
      require(n > 0, "eof in magic"); off += n
    }
    assert(new String(magic, US_ASCII) == "  V2")
  }

  test("subscribe: handshake, heartbeat NOP, FIN on success, REQ + redelivery on failure") {
    val server = new ServerSocket(0)
    val got = new ConcurrentLinkedQueue[(String, Int)]()
    val serverLog = new ConcurrentLinkedQueue[String]()
    val done = new CountDownLatch(1)

    val fake = new Thread(() => {
      val c = server.accept()
      val in = new BufferedInputStream(c.getInputStream)
      val out = c.getOutputStream
      // the client interleaves RDY re-arms with acks; log everything but
      // only stop a read once a non-RDY (FIN/REQ) line arrives
      def readAck(): Unit = {
        var line = readLine(in)
        while (line != null && line.startsWith("RDY")) {
          serverLog.add(line): Unit
          line = readLine(in)
        }
        if (line != null) serverLog.add(line): Unit
      }
      expectMagic(in)
      assert(readLine(in) == "SUB events work")
      out.write(NsqSource.frame(NsqSource.FrameResponse, "OK".getBytes(US_ASCII)))
      out.flush()
      assert(readLine(in) == "RDY 4")
      // heartbeat before any message: client must NOP
      out.write(NsqSource.frame(NsqSource.FrameResponse, "_heartbeat_".getBytes(US_ASCII)))
      out.flush()
      assert(readLine(in) == "NOP")
      // msg A: handler succeeds → FIN
      out.write(NsqSource.messageFrame("aaaaaaaaaaaaaaaa", 111L, 1, "alpha".getBytes(UTF_8)))
      out.flush()
      readAck() // FIN aaaaaaaaaaaaaaaa
      // msg B: handler fails on attempt 1 → REQ → redeliver attempts=2 → FIN
      out.write(NsqSource.messageFrame("bbbbbbbbbbbbbbbb", 222L, 1, "beta".getBytes(UTF_8)))
      out.flush()
      readAck() // REQ bbbbbbbbbbbbbbbb 1000
      out.write(NsqSource.messageFrame("bbbbbbbbbbbbbbbb", 222L, 2, "beta".getBytes(UTF_8)))
      out.flush()
      readAck() // FIN bbbbbbbbbbbbbbbb
      // window re-arm: 4/2 consumed → client re-arms at some point above;
      // drain any RDY lines that interleaved into the log
      done.countDown()
      c.close()
    }, "fake-nsqd")
    fake.setDaemon(true)
    fake.start()

    val sub = NsqSource.subscribe("127.0.0.1", server.getLocalPort, "events", "work",
      handler = m => {
        got.add((new String(m.body, UTF_8), m.attempts)): Unit
        !(new String(m.body, UTF_8) == "beta" && m.attempts == 1)
      },
      maxInFlight = 4)
    try {
      assert(done.await(10, TimeUnit.SECONDS), "fake nsqd did not finish script")
      import scala.jdk.CollectionConverters._
      val deliveries = got.iterator().asScala.toSeq
      assert(deliveries == Seq(("alpha", 1), ("beta", 1), ("beta", 2)))
      val acks = serverLog.iterator().asScala.toSeq.filterNot(_.startsWith("RDY"))
      assert(acks == Seq("FIN aaaaaaaaaaaaaaaa", "REQ bbbbbbbbbbbbbbbb 1000",
        "FIN bbbbbbbbbbbbbbbb"))
    } finally { sub.close(); server.close() }
  }

  test("handler throw requeues instead of wedging the pump") {
    val server = new ServerSocket(0)
    val reqSeen = new CountDownLatch(1)
    val fake = new Thread(() => {
      val c = server.accept()
      val in = new BufferedInputStream(c.getInputStream)
      val out = c.getOutputStream
      expectMagic(in)
      readLine(in) // SUB
      out.write(NsqSource.frame(NsqSource.FrameResponse, "OK".getBytes(US_ASCII)))
      out.flush()
      readLine(in) // RDY
      out.write(NsqSource.messageFrame("cccccccccccccccc", 1L, 1, "boom".getBytes(UTF_8)))
      out.flush()
      val line = readLine(in)
      if (line != null && line.startsWith("REQ cccccccccccccccc")) reqSeen.countDown()
      c.close()
    }, "fake-nsqd-2")
    fake.setDaemon(true)
    fake.start()
    val sub = NsqSource.subscribe("127.0.0.1", server.getLocalPort, "t", "ch",
      handler = _ => throw new RuntimeException("poison"))
    try assert(reqSeen.await(10, TimeUnit.SECONDS), "poison message was not REQed")
    finally { sub.close(); server.close() }
  }

  test("topic/channel grammar enforced") {
    intercept[IllegalArgumentException](NsqSource.checkName("bad topic", "topic"))
    intercept[IllegalArgumentException](NsqSource.checkName("", "topic"))
    intercept[IllegalArgumentException](NsqSource.checkName("x" * 65, "topic"))
    assert(NsqSource.checkName("events.prod-1_a", "topic") == "events.prod-1_a")
    assert(NsqSource.checkName("work#ephemeral", "channel") == "work#ephemeral")
    // the suffix counts toward the 64-char cap, as in nsqd's validator
    assert(NsqSource.checkName("x" * 54 + "#ephemeral", "topic").length == 64)
    intercept[IllegalArgumentException](
      NsqSource.checkName("x" * 55 + "#ephemeral", "topic"))
  }
}
