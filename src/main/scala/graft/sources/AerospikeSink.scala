package graft.sources

import graft.log.TopicLog
import graft.model.Envelope

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Semaphore

/**
 * Topic → Aerospike sink (reference `pulsar-io/aerospike/.../
 * AerospikeAbstractSink.java:46`): each record puts one bin
 * (`columnName` → value blob) under key (keyspace, keySet, record key),
 * with at most `maxConcurrentRequests` writes in flight (the
 * listener-queue semaphore, AerospikeAbstractSink.java:74-96), a
 * `retries`/`timeoutMs` write policy, ack on success / fail on error.
 *
 * The reference delegates the wire to the Aerospike client jar; here
 * the wire derives from the PUBLIC Aerospike protocol documentation:
 *
 *  - keys address records by a 20-byte RIPEMD-160 digest of
 *    `set ++ particle-type ++ user-key` — RIPEMD-160 implemented from
 *    the public Dobbertin/Bosselaers/Preneel specification and pinned
 *    to its published test vectors;
 *  - an AS_MSG is an 8-byte proto header (version 2, type 3, 48-bit
 *    size) + 22-byte message header (info flags, result code,
 *    generation, expiration, field/op counts) + fields (namespace 0,
 *    set 1, digest 4) + ops (WRITE = 2, bin type/name/value).
 */
object AerospikeSink {

  // ── RIPEMD-160 (public spec; vectors in AerospikeSinkSpec) ─────────

  object Ripemd160 {
    private val RL = Array(
      0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
      7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
      3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
      1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
      4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13)
    private val RR = Array(
      5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
      6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
      15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
      8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
      12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11)
    private val SL = Array(
      11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
      7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
      11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
      11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
      9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6)
    private val SR = Array(
      8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
      9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
      9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
      15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
      8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11)
    private val KL = Array(0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E)
    private val KR = Array(0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000)

    private def f(j: Int, x: Int, y: Int, z: Int): Int = j / 16 match {
      case 0 => x ^ y ^ z
      case 1 => (x & y) | (~x & z)
      case 2 => (x | ~y) ^ z
      case 3 => (x & z) | (y & ~z)
      case _ => x ^ (y | ~z)
    }

    private def rol(x: Int, n: Int): Int = Integer.rotateLeft(x, n)

    def digest(msg: Array[Byte]): Array[Byte] = {
      // MD4-style padding: 0x80, zeros, 64-bit little-endian bit length
      val bitLen = msg.length.toLong * 8
      val padded = {
        val n = ((msg.length + 8) / 64 + 1) * 64
        val b = ByteBuffer.allocate(n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put(msg).put(0x80.toByte)
        b.position(n - 8)
        b.putLong(bitLen)
        b.array()
      }
      var h0 = 0x67452301; var h1 = 0xEFCDAB89; var h2 = 0x98BADCFE
      var h3 = 0x10325476; var h4 = 0xC3D2E1F0
      val x = new Array[Int](16)
      var off = 0
      while (off < padded.length) {
        var i = 0
        while (i < 16) {
          x(i) = (padded(off + 4 * i) & 0xff) |
            ((padded(off + 4 * i + 1) & 0xff) << 8) |
            ((padded(off + 4 * i + 2) & 0xff) << 16) |
            ((padded(off + 4 * i + 3) & 0xff) << 24)
          i += 1
        }
        var al = h0; var bl = h1; var cl = h2; var dl = h3; var el = h4
        var ar = h0; var br = h1; var cr = h2; var dr = h3; var er = h4
        var j = 0
        while (j < 80) {
          var t = rol(al + f(j, bl, cl, dl) + x(RL(j)) + KL(j / 16), SL(j)) + el
          al = el; el = dl; dl = rol(cl, 10); cl = bl; bl = t
          t = rol(ar + f(79 - j, br, cr, dr) + x(RR(j)) + KR(j / 16), SR(j)) + er
          ar = er; er = dr; dr = rol(cr, 10); cr = br; br = t
          j += 1
        }
        val t = h1 + cl + dr
        h1 = h2 + dl + er; h2 = h3 + el + ar; h3 = h4 + al + br
        h4 = h0 + bl + cr; h0 = t
        off += 64
      }
      val out = ByteBuffer.allocate(20).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.putInt(h0).putInt(h1).putInt(h2).putInt(h3).putInt(h4)
      out.array()
    }
  }

  // ── the Aerospike wire shapes ──────────────────────────────────────

  /** Particle types from the public protocol. */
  val ParticleInteger = 1
  val ParticleString = 3
  val ParticleBlob = 4

  /** 20-byte record digest: RIPEMD-160 over set bytes ++ particle type
    * ++ user-key bytes (a string user key). */
  def keyDigest(set: String, userKey: String): Array[Byte] = {
    val setB = set.getBytes(UTF_8)
    val keyB = userKey.getBytes(UTF_8)
    val buf = new Array[Byte](setB.length + 1 + keyB.length)
    System.arraycopy(setB, 0, buf, 0, setB.length)
    buf(setB.length) = ParticleString.toByte
    System.arraycopy(keyB, 0, buf, setB.length + 1, keyB.length)
    Ripemd160.digest(buf)
  }

  private val FieldNamespace = 0
  private val FieldSet = 1
  private val FieldDigest = 4
  private val OpWrite = 2
  private val Info2Write = 0x01

  /** One single-bin put as a full AS_MSG wire message. */
  def putMessage(namespace: String, set: String, userKey: String,
                 bin: String, value: Array[Byte],
                 expirationSecs: Int = 0): Array[Byte] = {
    require(bin.getBytes(UTF_8).length <= 15, "aerospike bin names cap at 15 bytes")
    val digest = keyDigest(set, userKey)
    val nsB = namespace.getBytes(UTF_8)
    val setB = set.getBytes(UTF_8)
    val binB = bin.getBytes(UTF_8)
    val fields = Seq(
      (FieldNamespace, nsB), (FieldSet, setB), (FieldDigest, digest))
    val fieldsSz = fields.map(5 + _._2.length).sum
    val opSz = 4 + 4 + binB.length + value.length
    val msgSz = 22 + fieldsSz + opSz
    val buf = ByteBuffer.allocate(8 + msgSz)
    // proto header: version 2, type 3 (AS_MSG), 48-bit body size
    buf.putLong((2L << 56) | (3L << 48) | msgSz.toLong)
    // message header (22 bytes)
    buf.put(22.toByte)            // header size
    buf.put(0.toByte)             // info1
    buf.put(Info2Write.toByte)    // info2: write
    buf.put(0.toByte)             // info3
    buf.put(0.toByte)             // unused
    buf.put(0.toByte)             // result code (request: 0)
    buf.putInt(0)                 // generation
    buf.putInt(expirationSecs)    // expiration (TTL)
    buf.putInt(0)                 // transaction TTL
    buf.putShort(fields.size.toShort)
    buf.putShort(1.toShort)       // one op
    fields.foreach { case (tpe, data) =>
      buf.putInt(1 + data.length).put(tpe.toByte).put(data)
    }
    buf.putInt(4 + binB.length + value.length) // op size past the size field
    buf.put(OpWrite.toByte).put(ParticleBlob.toByte)
    buf.put(0.toByte)             // bin version (unused)
    buf.put(binB.length.toByte).put(binB).put(value)
    buf.array()
  }

  /** Result code of a response message (byte 13 = header offset 5). */
  def resultCode(response: Array[Byte]): Int =
    response(13) & 0xff

  /** Retryable per the client's write-policy disposition: timeout. */
  val ResultTimeout = 9

  /** Per-JVM in-flight semaphores, keyed by sink identity + bound (see
    * the registry note in [[topicToAerospikeSink]]). */
  private val inFlightRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, Semaphore]()

  /**
   * Stream the topic into Aerospike through `transport`. In-flight
   * writes are bounded by `maxConcurrentRequests` ACROSS partitions
   * (the reference's shared listener queue); `maxRetries` re-sends on
   * timeout results, any other non-zero code fails the stream.
   * Tombstones (null value) write empty blobs, mirroring the
   * reference's String sink which has no delete path.
   */
  def topicToAerospikeSink(topic: TopicLog,
                           transport: Array[Byte] => Array[Byte],
                           checkpoint: String,
                           namespace: String, keySet: String, columnName: String,
                           maxConcurrentRequests: Int = 8,
                           maxRetries: Int = 2,
                           sleeper: Long => Unit = Thread.sleep(_),
                           retryBackoffMs: Long = 50L): StreamingQuery = {
    require(maxConcurrentRequests >= 1, "maxConcurrentRequests must be >= 1")
    // the bound must hold ACROSS this JVM's concurrently-running
    // partitions: a closure-captured Semaphore deserializes once PER
    // TASK, handing every partition its own full permit set (bound ×
    // partitions writes in flight — the overload the bound exists to
    // prevent). The executor-side registry lookup shares ONE semaphore
    // per (sink identity, bound) per JVM; across executors the scope is
    // per-process, the same as the reference client's listener queue.
    val registryKey =
      s"$namespace|$keySet|$columnName|$maxConcurrentRequests"
    SinkHarness.startKeyed(topic, checkpoint) { rows =>
      val inFlight = inFlightRegistry.computeIfAbsent(registryKey,
        _ => new Semaphore(maxConcurrentRequests))
      rows.foreach { row =>
        val key = if (row.isNullAt(0)) null else row.getString(0)
        if (key != null) { // reference keys every record; keyless skipped
          val value =
            if (row.isNullAt(1)) Array.emptyByteArray
            else row.getString(1).getBytes(UTF_8)
          val msg = putMessage(namespace, keySet, key, columnName, value)
          inFlight.acquire()
          try {
            var attempt = 0
            var done = false
            while (!done) {
              val rc = resultCode(transport(msg))
              if (rc == 0) done = true
              else if (rc == ResultTimeout && attempt < maxRetries) {
                attempt += 1
                sleeper(retryBackoffMs)
              } else throw new IllegalStateException(
                s"aerospike write failed: result code $rc after $attempt retries")
            }
          } finally inFlight.release()
        }
      }
    }
  }
}
