package graft

import graft.log.TopicLog
import graft.model.TopicName
import graft.sources.{Connectors, NettySource}
import org.apache.spark.sql.functions._

import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, TimeUnit}

class NettySourceSpec extends SparkSpec {

  private def drain(q: ConcurrentLinkedQueue[String], n: Int,
                    timeoutMs: Long = 5000): Seq[String] = {
    val deadline = System.nanoTime() + TimeUnit.MILLISECONDS.toNanos(timeoutMs)
    while (q.size < n && System.nanoTime() < deadline) Thread.sleep(10)
    import scala.jdk.CollectionConverters._
    q.iterator().asScala.toSeq
  }

  test("tcp lines: newline framing, CRLF stripped, unterminated tail dropped") {
    val got = new ConcurrentLinkedQueue[String]()
    val server = NettySource.start(NettySource.Mode.TcpLines,
      b => { got.add(NettySource.utf8(b)): Unit })
    try {
      val s = new Socket("127.0.0.1", server.boundPort)
      s.getOutputStream.write("hello\r\nworld\npartial".getBytes(UTF_8))
      s.getOutputStream.flush()
      s.close()
      assert(drain(got, 2) == Seq("hello", "world"))
    } finally server.close()
  }

  test("tcp chunks: each read buffer is one record (reference ByteArrayDecoder parity)") {
    val got = new ConcurrentLinkedQueue[String]()
    val server = NettySource.start(NettySource.Mode.TcpChunks,
      b => { got.add(NettySource.utf8(b)): Unit })
    try {
      val s = new Socket("127.0.0.1", server.boundPort)
      s.getOutputStream.write("abc".getBytes(UTF_8)); s.getOutputStream.flush()
      Thread.sleep(100) // force a segment boundary between the two writes
      s.getOutputStream.write("def".getBytes(UTF_8)); s.getOutputStream.flush()
      s.close()
      val recs = drain(got, 2)
      // chunk boundaries follow segmentation; the BYTES are what's guaranteed
      assert(recs.mkString == "abcdef")
    } finally server.close()
  }

  test("udp: one datagram = one record") {
    val got = new ConcurrentLinkedQueue[String]()
    val server = NettySource.start(NettySource.Mode.Udp,
      b => { got.add(NettySource.utf8(b)): Unit })
    try {
      val sock = new DatagramSocket()
      val addr = InetAddress.getByName("127.0.0.1")
      Seq("dgram-1", "dgram-2").foreach { m =>
        val bytes = m.getBytes(UTF_8)
        sock.send(new DatagramPacket(bytes, bytes.length, addr, server.boundPort))
      }
      sock.close()
      assert(drain(got, 2).toSet == Set("dgram-1", "dgram-2"))
    } finally server.close()
  }

  test("http: POST body = one record, 100-continue honored, GET rejected 405") {
    val got = new ConcurrentLinkedQueue[String]()
    val server = NettySource.start(NettySource.Mode.Http,
      b => { got.add(NettySource.utf8(b)): Unit })
    try {
      val s = new Socket("127.0.0.1", server.boundPort)
      val out = s.getOutputStream
      val body = """{"event":"signup"}"""
      out.write((s"POST /ingest HTTP/1.1\r\nHost: x\r\nExpect: 100-continue\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes(US_ASCII))
      out.flush()
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(s.getInputStream, US_ASCII))
      assert(in.readLine() == "HTTP/1.1 100 Continue")
      assert(in.readLine() == "")
      out.write(body.getBytes(UTF_8)); out.flush()
      assert(in.readLine() == "HTTP/1.1 204 No Content")
      assert(in.readLine() == "")
      // same keep-alive connection: a GET is not an ingest
      out.write("GET /ingest HTTP/1.1\r\nHost: x\r\n\r\n".getBytes(US_ASCII))
      out.flush()
      assert(in.readLine() == "HTTP/1.1 405 Method Not Allowed")
      s.close()
      assert(drain(got, 1) == Seq(body))
    } finally server.close()
  }

  test("end-to-end: tcp lines through PushSource into a topic log") {
    val dir = Files.createTempDirectory("graft-netty").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("netty-in"), 2)
    val src = new Connectors.PushSource[String](spark, topic,
      toEnvelope = ds => ds.toDF("v").select(
        lit("").as(graft.model.Envelope.Key),
        col("v").as(graft.model.Envelope.Value),
        lit("io-netty-source").as(graft.model.Envelope.ProducerName),
        xxhash64(col("v")).as(graft.model.Envelope.SequenceId),
        current_timestamp().as(graft.model.Envelope.PublishTime),
        current_timestamp().as(graft.model.Envelope.EventTime)),
      checkpoint = s"$dir/ckpt")(spark.implicits.newStringEncoder)
    val server = NettySource.start(NettySource.Mode.TcpLines,
      b => src.push(NettySource.utf8(b)))
    val q = src.start()
    try {
      val s = new Socket("127.0.0.1", server.boundPort)
      s.getOutputStream.write("m1\nm2\nm3\n".getBytes(UTF_8))
      s.getOutputStream.flush()
      s.close()
      val deadline = System.currentTimeMillis() + 5000
      var n = 0L
      while (n < 3 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = topic.read().count()
      }
      assert(n == 3)
      assert(topic.read().select(graft.model.Envelope.Value)
        .collect().map(_.getString(0)).toSet == Set("m1", "m2", "m3"))
    } finally { q.stop(); server.close() }
  }
}
