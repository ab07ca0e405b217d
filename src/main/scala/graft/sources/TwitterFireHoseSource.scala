package graft.sources

import java.io.{BufferedInputStream, InputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicBoolean
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/**
 * Twitter FireHose source (reference `pulsar-io/twitter/.../
 * TwitterFireHose.java:59` — a PushSource streaming statuses over the
 * public streaming API via the hosebird client; endpoint selection
 * `TwitterFireHose.java:152`: sample when no followings/terms, filter
 * otherwise; per-record event time parsed from `created_at` with the
 * `"EEE MMM d HH:mm:ss Z yyyy"` format, falling back to wall clock only
 * when `guestimateTweetTime` is set — `TwitterRecord.java:46`; parse
 * failures are logged and skipped, the stream never stops —
 * `TwitterFireHose.java:104`).
 *
 * The reference delegates wire mechanics to the hbc client library;
 * everything here derives from the PUBLIC specs instead: OAuth 1.0a
 * request signing from RFC 5849 §3.4 (HMAC-SHA1, verified against the
 * RFC's own worked example), and the streaming body formats documented
 * for the statuses endpoints — newline-delimited JSON messages, blank
 * keep-alive lines, and the `delimited=length` framing where each
 * message is preceded by its byte length on its own line.
 *
 * The record value is the RAW tweet JSON — Spark-first: schema applies
 * downstream via `from_json` ([[tweetSchema]]), so the source never
 * deserializes on the hot path and the engine prunes unneeded fields.
 */
object TwitterFireHoseSource {

  /** Upper bound for one length-framed message (same defense as
    * NettySource's record cap): the reference firehose never ships
    * multi-megabyte single statuses, and the frame size is
    * peer-supplied. */
  private[sources] val MaxMessageBytes: Int = 16 * 1024 * 1024

  final case class OAuthKeys(consumerKey: String, consumerSecret: String,
                             token: String, tokenSecret: String)

  final case class Tweet(json: String, eventTimeMs: Option[Long])

  // ── OAuth 1.0a (RFC 5849 §3.4–3.5) ─────────────────────────────────

  /** RFC 3986 §2.3 unreserved set; everything else percent-encoded
    * uppercase (RFC 5849 §3.6). */
  private[graft] def pctEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = b.toChar
      if (c.isLetterOrDigit && c < 128 || c == '-' || c == '.' || c == '_' || c == '~')
        sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Signature base string (RFC 5849 §3.4.1): method & encoded base URI
    * & encoded normalized params (sorted by encoded name then value,
    * joined with =/& — §3.4.1.3.2). */
  private[graft] def signatureBase(method: String, baseUri: String,
                                   params: Seq[(String, String)]): String = {
    val normalized = params
      .map { case (k, v) => (pctEncode(k), pctEncode(v)) }
      .sorted
      .map { case (k, v) => s"$k=$v" }
      .mkString("&")
    s"${method.toUpperCase}&${pctEncode(baseUri)}&${pctEncode(normalized)}"
  }

  /** HMAC-SHA1 over the base string, keyed by
    * `enc(consumerSecret)&enc(tokenSecret)` (§3.4.2), base64. */
  private[graft] def hmacSha1Signature(base: String, consumerSecret: String,
                                       tokenSecret: String): String = {
    val key = s"${pctEncode(consumerSecret)}&${pctEncode(tokenSecret)}"
    val mac = Mac.getInstance("HmacSHA1")
    mac.init(new SecretKeySpec(key.getBytes(UTF_8), "HmacSHA1"))
    java.util.Base64.getEncoder.encodeToString(mac.doFinal(base.getBytes(UTF_8)))
  }

  /** The `Authorization: OAuth …` header (§3.5.1). `nonce`/`timestamp`
    * injectable so signatures are deterministic under test. */
  private[graft] def authorizationHeader(method: String, baseUri: String,
                                         queryParams: Seq[(String, String)],
                                         keys: OAuthKeys, nonce: String,
                                         timestamp: Long): String = {
    val oauthParams = Seq(
      "oauth_consumer_key" -> keys.consumerKey,
      "oauth_nonce" -> nonce,
      "oauth_signature_method" -> "HMAC-SHA1",
      "oauth_timestamp" -> timestamp.toString,
      "oauth_token" -> keys.token,
      "oauth_version" -> "1.0")
    val base = signatureBase(method, baseUri, queryParams ++ oauthParams)
    val sig = hmacSha1Signature(base, keys.consumerSecret, keys.tokenSecret)
    (oauthParams :+ ("oauth_signature" -> sig))
      .map { case (k, v) => s"""${pctEncode(k)}="${pctEncode(v)}"""" }
      .mkString("OAuth ", ", ", "")
  }

  // ── endpoint selection (TwitterFireHose.java:152) ──────────────────

  /** (path, query params): sample when no followings/terms, filter with
    * `follow`/`track` CSVs otherwise. */
  private[graft] def endpoint(followings: Seq[Long], terms: Seq[String],
                              delimited: Boolean,
                              stallWarnings: Boolean): (String, Seq[(String, String)]) = {
    val base =
      (if (delimited) Seq("delimited" -> "length") else Nil) ++
        (if (stallWarnings) Seq("stall_warnings" -> "true") else Nil)
    if (followings.isEmpty && terms.isEmpty)
      ("/1.1/statuses/sample.json", base)
    else {
      val filter =
        (if (followings.nonEmpty) Seq("follow" -> followings.mkString(",")) else Nil) ++
          (if (terms.nonEmpty) Seq("track" -> terms.mkString(",")) else Nil)
      ("/1.1/statuses/filter.json", filter ++ base)
    }
  }

  // ── stream body parsing ────────────────────────────────────────────

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var b = in.read()
    while (b >= 0 && b != '\n') {
      if (b != '\r') sb.append(b.toChar)
      b = in.read()
    }
    if (b < 0 && sb.isEmpty) null else sb.toString
  }

  /** Next message from the stream: skips blank keep-alive lines; in
    * `delimited=length` framing a digits-only line is the byte count of
    * the message that follows. Returns null at EOF. */
  private[graft] def nextMessage(in: InputStream): String = {
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in) // keep-alives
    if (line == null) null
    else if (line.forall(_.isDigit)) {
      val want = line.toInt
      // the frame size is PEER-SUPPLIED: without a cap a corrupt or
      // hostile "2000000000" line allocates 2 GB and OOMs the JVM
      // instead of failing the connection (NettySource caps the same
      // way with MaxRecordBytes)
      require(want <= MaxMessageBytes,
        s"delimited frame of $want bytes exceeds cap $MaxMessageBytes")
      val buf = new Array[Byte](want)
      var off = 0
      while (off < want) {
        val n = in.read(buf, off, want - off)
        if (n < 0) return null
        off += n
      }
      new String(buf, UTF_8).trim
    } else line
  }

  /** Top-level string field from a JSON object — a depth-tracking scan,
    * so `user.created_at` never shadows the tweet's own `created_at`. */
  private[graft] def topLevelString(json: String, field: String): Option[String] = {
    val needle = s""""$field""""
    var i = 0
    var depth = 0
    var inStr = false
    while (i < json.length) {
      val c = json.charAt(i)
      if (inStr) c match {
        case '\\' => i += 1
        case '"' => inStr = false
        case _ =>
      } else c match {
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case '"' if depth == 1 && json.startsWith(needle, i) &&
          json.indexOf(':', i + needle.length) >= 0 =>
          val colon = json.indexOf(':', i + needle.length)
          if (json.substring(i + needle.length, colon).trim.isEmpty) {
            var j = colon + 1
            while (j < json.length && json.charAt(j).isWhitespace) j += 1
            if (j < json.length && json.charAt(j) == '"') {
              val sb = new StringBuilder
              j += 1
              while (j < json.length && json.charAt(j) != '"') {
                if (json.charAt(j) == '\\' && j + 1 < json.length) j += 1
                sb.append(json.charAt(j))
                j += 1
              }
              return Some(sb.toString)
            } else return None // non-string value
          } else inStr = true
        case '"' => inStr = true
        case _ =>
      }
      i += 1
    }
    None
  }

  /** `created_at` format from TwitterRecord.java:32. */
  private val CreatedAt = java.time.format.DateTimeFormatter
    .ofPattern("EEE MMM d HH:mm:ss Z yyyy", java.util.Locale.ENGLISH)

  /** Event-time rule (TwitterRecord.java:46): parse `created_at`; on
    * absence/parse failure fall back to `now` only when guestimating. */
  private[graft] def eventTime(json: String, guestimate: Boolean,
                               now: () => Long = () => System.currentTimeMillis()): Option[Long] =
    topLevelString(json, "created_at").flatMap { s =>
      try Some(java.time.OffsetDateTime.parse(s, CreatedAt).toInstant.toEpochMilli)
      catch { case _: java.time.format.DateTimeParseException => None }
    }.orElse(if (guestimate) Some(now()) else None)

  // ── the source ─────────────────────────────────────────────────────

  /**
   * Connect to `host:port` (loopback stand-in for the streaming API
   * host), sign the request, and pump tweets into `handler` on a daemon
   * thread. Disconnects reconnect with capped exponential backoff (the
   * hosebird client's recovery behavior); `running` gates the loop.
   */
  def subscribe(host: String, port: Int, keys: OAuthKeys,
                handler: Tweet => Unit,
                followings: Seq[Long] = Nil,
                terms: Seq[String] = Nil,
                delimited: Boolean = false,
                stallWarnings: Boolean = false,
                guestimateTweetTime: Boolean = false,
                backoffBaseMs: Long = 100L,
                backoffMaxMs: Long = 5000L,
                sleeper: Long => Unit = Thread.sleep(_)): Firehose =
    new Firehose(host, port, keys, handler, followings, terms, delimited,
      stallWarnings, guestimateTweetTime, backoffBaseMs, backoffMaxMs, sleeper)

  final class Firehose private[TwitterFireHoseSource](
      host: String, port: Int, keys: OAuthKeys, handler: Tweet => Unit,
      followings: Seq[Long], terms: Seq[String], delimited: Boolean,
      stallWarnings: Boolean, guestimate: Boolean,
      backoffBaseMs: Long, backoffMaxMs: Long, sleeper: Long => Unit) {

    private val running = new AtomicBoolean(true)
    @volatile private var socket: Socket = null
    /** Reconnect count — observable for specs. */
    @volatile var reconnects: Int = 0

    private val pump = new Thread(() => pumpLoop(), s"twitter-firehose-$host")
    pump.setDaemon(true)
    pump.start()

    private def connectOnce(): Unit = {
      val (path, params) = endpoint(followings, terms, delimited, stallWarnings)
      val query = params.map { case (k, v) => s"${pctEncode(k)}=${pctEncode(v)}" }
        .mkString("&")
      val target = if (query.isEmpty) path else s"$path?$query"
      val auth = authorizationHeader("GET", s"https://$host$path", params, keys,
        nonce = java.util.UUID.randomUUID().toString.replace("-", ""),
        timestamp = System.currentTimeMillis() / 1000)
      val s = new Socket()
      s.connect(new InetSocketAddress(host, port), 5000)
      socket = s
      val out = s.getOutputStream
      out.write((s"GET $target HTTP/1.1\r\nHost: $host\r\n" +
        s"Authorization: $auth\r\nConnection: keep-alive\r\n\r\n").getBytes(UTF_8))
      out.flush()
      val in = new BufferedInputStream(s.getInputStream)
      val status = readLine(in)
      require(status != null && status.contains(" 200 "), s"stream rejected: $status")
      var h = readLine(in)
      while (h != null && h.nonEmpty) h = readLine(in) // headers
      var msg = nextMessage(in)
      while (running.get() && msg != null) {
        // reference behavior: a bad message is skipped, never fatal
        try handler(Tweet(msg, eventTime(msg, guestimate)))
        catch { case scala.util.control.NonFatal(_) => () }
        msg = nextMessage(in)
      }
    }

    private def pumpLoop(): Unit = {
      var attempt = 0
      while (running.get()) {
        try {
          connectOnce()
          attempt = 0 // a served connection resets the backoff
        } catch { case scala.util.control.NonFatal(_) => () }
        finally { if (socket != null) { try socket.close() catch { case _: Exception => () } } }
        if (running.get()) {
          reconnects += 1
          attempt += 1
          sleeper(math.min(backoffBaseMs << math.min(attempt - 1, 16), backoffMaxMs))
        }
      }
    }

    def close(): Unit = {
      running.set(false)
      if (socket != null) { try socket.close() catch { case _: Exception => () } }
      pump.join(2000)
    }
  }

  /** TweetData's field surface (TweetData.java:27 incl. the nested user
    * and delete marker) as a Spark schema for `from_json` over the raw
    * payloads this source lands. */
  def tweetSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("created_at", StringType),
      StructField("id", LongType),
      StructField("id_str", StringType),
      StructField("text", StringType),
      StructField("source", StringType),
      StructField("truncated", BooleanType),
      StructField("user", StructType(Seq(
        StructField("id", LongType),
        StructField("screen_name", StringType),
        StructField("name", StringType),
        StructField("verified", BooleanType),
        StructField("followers_count", LongType),
        StructField("friends_count", LongType),
        StructField("statuses_count", LongType),
        StructField("created_at", StringType)))),
      StructField("is_quote_status", BooleanType),
      StructField("quote_count", LongType),
      StructField("reply_count", LongType),
      StructField("retweet_count", LongType),
      StructField("favorite_count", LongType),
      StructField("favorited", BooleanType),
      StructField("retweeted", BooleanType),
      StructField("filter_level", StringType),
      StructField("lang", StringType),
      StructField("timestamp_ms", StringType),
      StructField("delete", StructType(Seq(
        StructField("status", StructType(Seq(
          StructField("id", LongType),
          StructField("user_id", LongType)))))))))
  }
}
