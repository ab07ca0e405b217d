package graft.sources

import graft.log.TopicLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Topic → Redis sink (reference pulsar-io/redis/.../sink/RedisSink.java:60
 * write/flush batching and RedisAbstractConfig.java:36 batchSize/
 * operationTimeout): record key → redis key, record value → SET, null
 * value → DEL (tombstone), optional per-key TTL. The part that holds the
 * bugs — RESP2 command framing, pipeline batching, reply/error
 * accounting, per-key apply order — is concrete and tested; the socket
 * is a pluggable `transport: pipelineBytes => replies` (production wires
 * a TCP client; tests capture and parse the frames).
 *
 * RESP2 framing (public protocol spec: redis.io/docs/reference/protocol-spec):
 * every command is an array of bulk strings —
 * `*<n>\r\n` then per arg `$<len>\r\n<bytes>\r\n`. A pipeline is the
 * plain concatenation of command frames; replies come back one per
 * command in order (`+OK` for SET, `:<n>` for DEL/EXPIRE, `-ERR…` on
 * failure).
 *
 * Scale shape: identical to the JDBC/ES sinks — HW-filtered foreachBatch
 * (read-committed), repartition by key + offset order within partitions
 * (last-write-wins under replay; SET/DEL are idempotent so at-least-once
 * converges), `batchSize` commands per pipeline round trip, executors
 * write in parallel.
 */
object RedisSink {

  /** One RESP2 command frame: array of bulk strings. */
  private[graft] def respCommand(args: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"*${args.length}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      out.write(s"$$${a.length}\r\n".getBytes(UTF_8))
      out.write(a)
      out.write("\r\n".getBytes(UTF_8))
    }
    out.toByteArray
  }

  /** Commands for one record: SET (with optional EX ttl) or DEL on a
    * null value — the reference's tombstone mapping. Exposed for tests:
    * this is the exact byte layout that reaches the wire. */
  private[graft] def commandsFor(key: String, value: String,
                                 ttlSeconds: Option[Long]): Seq[Array[Byte]] =
    if (key == null) Nil // redis has no concept of a keyless write
    else if (value == null) Seq(respCommand(Seq("DEL".getBytes(UTF_8), key.getBytes(UTF_8))))
    else ttlSeconds match {
      case Some(ttl) => Seq(respCommand(Seq("SET".getBytes(UTF_8),
        key.getBytes(UTF_8), value.getBytes(UTF_8),
        "EX".getBytes(UTF_8), ttl.toString.getBytes(UTF_8))))
      case None => Seq(respCommand(Seq("SET".getBytes(UTF_8),
        key.getBytes(UTF_8), value.getBytes(UTF_8))))
    }

  /**
   * Stream the topic into Redis through `transport: pipeline bytes =>
   * one reply line per command`. A reply count mismatch or any `-ERR`
   * reply fails the microbatch (the streaming engine retries it — SET and
   * DEL are idempotent, so the retry converges).
   */
  def topicToRedisSink(topic: TopicLog,
                       transport: Array[Byte] => Seq[String],
                       ttlSeconds: Option[Long] = None,
                       checkpoint: String,
                       batchSize: Int = 200): StreamingQuery = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    ttlSeconds.foreach(t => require(t > 0, s"ttlSeconds must be positive, got $t"))
    SinkHarness.startKeyed(topic, checkpoint) { rows =>
      flushPartition(rows, transport, ttlSeconds, batchSize)
    }
  }

  /** Executor-side partition writer: `batchSize` commands per pipeline. */
  private def flushPartition(rows: Iterator[Row],
                             transport: Array[Byte] => Seq[String],
                             ttlSeconds: Option[Long], batchSize: Int): Unit = {
    val buf = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    def flush(): Unit = if (buf.nonEmpty) {
      val pipeline = buf.foldLeft(new java.io.ByteArrayOutputStream()) {
        (o, c) => o.write(c); o
      }.toByteArray
      val replies = transport(pipeline)
      require(replies.length == buf.length,
        s"redis pipeline sent ${buf.length} commands, got ${replies.length} replies")
      replies.find(_.startsWith("-")).foreach { err =>
        throw new IllegalStateException(s"redis command failed: $err")
      }
      buf.clear()
    }
    rows.foreach { r =>
      val cmds = commandsFor(r.getString(0), r.getString(1), ttlSeconds)
      if (cmds.nonEmpty) {
        buf ++= cmds
        if (buf.length >= batchSize) flush()
      }
    }
    flush()
  }
}
